"""Unit tests for infra services: Config, Dimension, Field, Tracers,
Reductions — mirroring the reference's test/infra and test/base units
(SURVEY.md section 4)."""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU x64 backend)

import jax
import jax.numpy as jnp

from omega_tpu.infra.config import Config, default_config
from omega_tpu.infra.dimension import DimensionRegistry
from omega_tpu.infra.errors import ConfigError, FieldError
from omega_tpu.infra.field import FieldRegistry
from omega_tpu.core.tracers import (DEFAULT_GROUPS, select_tracers,
                                    register_tracer_fields)
from omega_tpu.parallel import reductions


# ---------------- Config (test/infra/ConfigTest.cpp analogue) ----------------

def test_config_roundtrip(tmp_path):
    cfg = default_config()
    tend = cfg.get_group("Tendencies")
    assert tend.get_bool("ThicknessFluxTendencyEnable") is True
    assert tend.get_float("ViscDel2") == 1.0e3
    assert cfg.get_group("TimeIntegration").get_str("TimeStepper") == \
        "Forward-Backward"

    # typed set/add/remove
    tend.set("ViscDel2", 5.0)
    assert tend.get_float("ViscDel2") == 5.0
    with pytest.raises(ConfigError):
        tend.set("NoSuchKey", 1)
    tend.add("NewKey", [1, 2, 3])
    assert tend.get_list("NewKey") == [1, 2, 3]
    with pytest.raises(ConfigError):
        tend.add("NewKey", 0)
    tend.remove("NewKey")
    assert not tend.exists("NewKey")

    # write-back provenance round trip (infra/Config.h:361-367)
    p = tmp_path / "omega.yml"
    cfg.write(str(p))
    cfg2 = Config.read_all(str(p))
    assert cfg2.get_group("Tendencies").get_float("ViscDel2") == 5.0
    assert cfg2.get_group("Tracers").get_list("Base") == \
        ["Temperature", "Salinity"]


def test_config_type_errors():
    cfg = default_config()
    tend = cfg.get_group("Tendencies")
    with pytest.raises(ConfigError):
        tend.get_str("ViscDel2")
    with pytest.raises(ConfigError):
        tend.get_int("ThicknessFluxTendencyEnable")  # bool is not int
    with pytest.raises(ConfigError):
        cfg.get_group("Tendencies").get_group("ViscDel2")  # value not group
    with pytest.raises(ConfigError):
        cfg.get("Missing")
    assert cfg.get("Missing", 42) == 42


# ---------------- Dimension ----------------

def test_dimension_registry():
    reg = DimensionRegistry()
    reg.create("NVertLayers", 64)
    d = reg.get("NVertLayers")
    assert d.global_length == 64 and not d.distributed
    offs = np.array([0, 1, 2, -1, -1])
    reg.create("NCells", 100, offsets=offs)
    dc = reg.get("NCells")
    assert dc.distributed and dc.local_length == 5
    assert dc.owned_mask().sum() == 3
    with pytest.raises(FieldError):
        reg.create("NCells", 3)
    with pytest.raises(FieldError):
        reg.get("Nope")


# ---------------- Field / FieldGroup ----------------

def test_field_registry():
    reg = FieldRegistry()
    reg.create("LayerThickness", description="Layer thickness", units="m",
               dim_names=("NCells", "NVertLayers"), time_dependent=True)
    reg.create("NormalVelocity", units="m s-1",
               dim_names=("NEdges", "NVertLayers"), time_dependent=True)
    reg.create_group("State")
    reg.add_to_group("State", "LayerThickness", "NormalVelocity")
    assert reg.group_members("State") == ["LayerThickness", "NormalVelocity"]

    attrs = reg.get("LayerThickness").cf_attrs()
    assert attrs["units"] == "m" and attrs["long_name"] == "Layer thickness"

    data = np.ones((4, 2))
    reg.attach("LayerThickness", data)
    assert reg.get("LayerThickness").data is data

    # contents resolution: groups + fields, deduped, order preserved
    out = reg.resolve_contents(["State", "LayerThickness"])
    assert out == ["LayerThickness", "NormalVelocity"]
    with pytest.raises(FieldError):
        reg.resolve_contents(["Junk"])


# ---------------- Tracers catalog ----------------

def test_tracer_selection():
    tset = select_tracers(DEFAULT_GROUPS)
    assert tset.ntracers == 5
    assert tset.get_index("Temperature") == 0
    assert tset.get_index("Debug3") == 4
    assert tset.group_range("Base") == (0, 2)
    assert tset.group_range("Debug") == (2, 3)
    base_only = select_tracers({"Base": ["Temperature", "Salinity"]})
    assert base_only.ntracers == 2
    with pytest.raises(ConfigError):
        select_tracers({"Base": ["NotATracer"]})

    reg = FieldRegistry()
    register_tracer_fields(reg, tset)
    assert reg.group_members("Tracers") == list(tset.names)
    assert reg.get("Salinity").cf_attrs()["units"] == "g kg-1"


# ---------------- Reductions (test/base/ReductionsTest.cpp analogue) --------

def test_dd_sum_exactness():
    # sum that plain float32/float64 sequential addition gets wrong
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10_001) * 10.0 ** rng.integers(-8, 8, 10_001)
    exact = float(np.sum(np.sort(np.float64(x)), dtype=np.longdouble))
    got = float(reductions.global_sum(jnp.asarray(x)))
    assert abs(got - exact) <= 1e-9 * abs(exact)


def test_global_sum_decomposition_invariant():
    """The ddSum contract: identical double result for any shard count."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096) * 10.0 ** rng.integers(-6, 6, 4096)
    whole = float(reductions.global_sum(jnp.asarray(x)))

    from jax.sharding import Mesh, PartitionSpec as P
    devs = jax.devices()[:8]
    mesh = Mesh(np.array(devs), ("x",))

    def local(xs):
        return reductions.global_sum(xs, axis_name="x")

    sharded = jax.jit(jax.shard_map(local, mesh=mesh, in_specs=P("x"),
                                    out_specs=P(), check_vma=False))
    got = float(sharded(jnp.asarray(x)))
    assert got == whole  # bit-for-bit


def test_global_min_max_mask():
    x = jnp.asarray(np.array([3.0, -7.0, 2.0, 100.0]))
    mask = jnp.asarray(np.array([True, True, True, False]))
    assert float(reductions.global_min(x, mask=mask)) == -7.0
    assert float(reductions.global_max(x, mask=mask)) == 3.0


def test_global_sum_multiplier_mask():
    x = jnp.arange(6, dtype=jnp.float64)
    m = jnp.ones(6) * 2.0
    mask = x < 3
    got = float(reductions.global_sum(x, multiplier=m, mask=mask))
    assert got == 2.0 * (0 + 1 + 2)


def test_reference_default_yml_parses():
    """Parity check: the reference's own configs/Default.yml parses with
    our Config and builds a ModelConfig (schema compatibility)."""
    import os
    path = ("/root/reference/components/omega/configs/Default.yml")
    if not os.path.exists(path):
        pytest.skip("reference tree not mounted")
    from omega_tpu.core.config import model_config_from_yaml
    cfg = Config.read_all(path)
    assert cfg.get_group("Tendencies").get_float("ViscDel4") == 1.2e11
    assert cfg.get_group("TimeIntegration").get_str("TimeStepper") == \
        "Forward-Backward"
    assert cfg.get_group("IOStreams").get_group("RestartWrite") \
        .get_str("PointerFilename") == "ocn.pointer"
    mc = model_config_from_yaml(cfg, nvertlayers=4, ntracers=2)
    assert mc.tendencies.visc_del2 == 1.0e3
    assert mc.flux_tracer_type == "center"
    # stream specs parse
    from omega_tpu.io.stream import StreamSpec
    io_grp = cfg.get_group("IOStreams")
    for name in io_grp.keys():
        spec = StreamSpec.from_config(name, io_grp.get_group(name))
        assert spec.mode in ("read", "write")


# ---------------- Config battery (test/infra/ConfigTest.cpp, 708 LoC) ------

def _battery_config():
    from omega_tpu.infra.config import Config
    return Config.from_yaml("""
Omega:
  Scalars:
    AnInt: 3
    ABigInt: 123456789012345
    AFloat: 4.5
    ASciFloat: 1.0e3
    ATrue: true
    AFalse: false
    AString: some string
  Vectors:
    Ints: [1, 2, 3]
    Floats: [1.5, 2.0, 3]
    Bools: [true, false, true]
    Strings: [a, b, c]
  Nested:
    Inner:
      Deep: 7
""")


def test_config_typed_getters_all_types():
    cfg = _battery_config()
    s = cfg.get_group("Scalars")
    assert s.get_int("AnInt") == 3
    assert s.get_int("ABigInt") == 123456789012345   # I8 range
    assert s.get_float("AFloat") == 4.5
    assert s.get_float("ASciFloat") == 1000.0        # yaml-cpp exponent
    assert s.get_bool("ATrue") is True
    assert s.get_bool("AFalse") is False
    assert s.get_str("AString") == "some string"
    v = cfg.get_group("Vectors")
    assert v.get_int_list("Ints") == [1, 2, 3]
    assert v.get_float_list("Floats") == [1.5, 2.0, 3.0]
    assert v.get_bool_list("Bools") == [True, False, True]
    assert v.get_str_list("Strings") == ["a", "b", "c"]
    assert cfg.get_group("Nested").get_group("Inner").get_int("Deep") == 7


def test_config_type_mismatch_errors():
    from omega_tpu.infra.errors import ConfigError
    cfg = _battery_config()
    s = cfg.get_group("Scalars")
    for call in (lambda: s.get_int("AFloat"),
                 lambda: s.get_int("ATrue"),       # bool is not int
                 lambda: s.get_float("AString"),
                 lambda: s.get_str("AnInt"),
                 lambda: s.get_bool("AnInt"),
                 lambda: s.get_int("Missing"),
                 lambda: cfg.get_group("Scalars").get_group("AnInt"),
                 lambda: cfg.get_group("Vectors").get_int_list("Floats"),
                 lambda: cfg.get_group("Vectors").get_bool_list("Ints")):
        with pytest.raises(ConfigError):
            call()


def test_config_add_set_remove_roundtrip(tmp_path):
    """add/set/remove semantics + full write/re-read round trip
    (ConfigTest's write-back battery; infra/Config.h:361-367)."""
    from omega_tpu.infra.config import Config
    from omega_tpu.infra.errors import ConfigError
    cfg = _battery_config()
    s = cfg.get_group("Scalars")
    with pytest.raises(ConfigError):
        s.add("AnInt", 9)            # add refuses existing
    with pytest.raises(ConfigError):
        s.set("NewKey", 9)           # set refuses missing
    s.add("NewKey", 9)
    s.set("AnInt", 42)
    s.remove("AString")
    with pytest.raises(ConfigError):
        s.remove("AString")
    g = cfg.add_group("Added")
    g.add("X", [1.0, 2.0])

    path = str(tmp_path / "round.yml")
    cfg.write(path)
    back = Config.read_all(path)
    assert back.get_group("Scalars").get_int("AnInt") == 42
    assert back.get_group("Scalars").get_int("NewKey") == 9
    assert not back.get_group("Scalars").exists("AString")
    assert back.get_group("Added").get_float_list("X") == [1.0, 2.0]
    assert back.as_dict() == cfg.as_dict()


def test_config_iteration_and_queries():
    cfg = _battery_config()
    assert set(cfg.keys()) == {"Scalars", "Vectors", "Nested"}
    assert "Scalars" in cfg
    assert cfg.is_group("Scalars") and not cfg.get_group(
        "Scalars").is_group("AnInt")
    assert [k for k in cfg.get_group("Nested")] == ["Inner"]
