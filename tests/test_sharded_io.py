"""Streaming append + sharded (region-write) IO tests.

The reference writes through PIO decompositions that map each rank's
owned elements to global file offsets (base/IO.h:256,305); here the
analogue is ShardedFieldData + hdf5 region writes, plus O(frame)
in-place appends for both file flavors.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import yaml

from omega_tpu.io.netcdf import append_netcdf, read_netcdf, write_netcdf
from omega_tpu.io.stream import ShardedFieldData


@pytest.mark.parametrize("fmt", ["netcdf3", "hdf5"])
def test_streaming_append(tmp_path, fmt):
    """append_netcdf grows the record dimension in place for both
    flavors; frames read back in order."""
    path = str(tmp_path / f"t_{fmt}.nc")
    write_netcdf(path, dims={"Time": 1, "n": 4},
                 variables={"x": np.arange(4.0)[None]},
                 var_dims={"x": ("Time", "n")},
                 attrs={"SimulationTime": "0001-01-01_00:00:00"},
                 unlimited="Time", fmt=fmt)
    for i in range(1, 4):
        ok = append_netcdf(path,
                           variables={"x": (np.arange(4.0) + 10 * i)[None]},
                           var_dims={"x": ("Time", "n")},
                           attrs={"SimulationTime": f"frame{i}"},
                           unlimited="Time")
        assert ok, f"in-place append failed for {fmt}"
    nc = read_netcdf(path)
    x = np.asarray(nc.get("x"))
    assert x.shape == (4, 4)
    for i in range(4):
        np.testing.assert_array_equal(x[i], np.arange(4.0) + 10 * i)
    assert nc.attrs["SimulationTime"] == "frame3"


def test_sharded_field_data_roundtrip():
    """Region writes of per-shard owned rows reassemble the global
    array without materializing it."""
    from omega_tpu.io.netcdf import write_sharded_frame

    rng = np.random.default_rng(1)
    C, K, S = 40, 3, 4
    full = rng.standard_normal((C, K))
    # overlapping halos: shard s owns rows [10s, 10s+10), local window
    # [10s-2, 10s+12) wrapped
    l2g = np.stack([(10 * s - 2 + np.arange(14)) % C for s in range(S)])
    owned = np.zeros((S, 14), bool)
    owned[:, 2:12] = True
    stacked = full[l2g]
    sv = ShardedFieldData(stacked, l2g, owned, C)
    np.testing.assert_array_equal(sv.materialize(), full)

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "s.nc")
        write_netcdf(path, dims={"Time": 1, "NCells": C, "K": K},
                     variables={}, var_dims={}, unlimited="Time",
                     fmt="hdf5")
        for frame in range(2):
            write_sharded_frame(path, {
                "h": dict(vdims=("NCells", "K"), shape=(C, K),
                          dtype=np.float64,
                          shards=sv.iter_owned(),
                          time_dependent=True, attrs={"units": "m"})})
        nc = read_netcdf(path)
        h = np.asarray(nc.get("h"))
        assert h.shape == (2, C, K)
        np.testing.assert_array_equal(h[0], full)
        np.testing.assert_array_equal(h[1], full)
        assert nc.var_attrs["h"]["units"] == "m"


def test_region_reader_rows(tmp_path):
    """RegionReader pulls exactly the requested rows (latest frame) from
    both file flavors without the global array."""
    from omega_tpu.io.netcdf import RegionReader

    rng = np.random.default_rng(7)
    C, K = 30, 4
    x0, x1 = rng.standard_normal((2, C, K))
    static = rng.standard_normal((C,))
    for fmt in ("netcdf3", "hdf5"):
        path = str(tmp_path / f"rr_{fmt}.nc")
        write_netcdf(path, dims={"Time": 1, "C": C, "K": K},
                     variables={"x": x0[None], "s": static},
                     var_dims={"x": ("Time", "C", "K"), "s": ("C",)},
                     attrs={"SimulationTime": "t0"},
                     unlimited="Time", fmt=fmt)
        append_netcdf(path, variables={"x": x1[None]},
                      var_dims={"x": ("Time", "C", "K")},
                      attrs={"SimulationTime": "t1"}, unlimited="Time")
        rows = np.array([17, 3, 3, 29, 0])
        with RegionReader(path) as r:
            assert r.attrs["SimulationTime"] == "t1"
            assert r.has("x") and not r.has("nope")
            np.testing.assert_array_equal(r.read_rows("x", rows), x1[rows])
            np.testing.assert_array_equal(r.read_rows("s", rows),
                                          static[rows])


def test_region_read_restart_roundtrip(tmp_path):
    """Restart chain through the DEFERRED region-read path: run 1 writes
    a sharded restart; run 2 (ShardedIO + explicit structured decomp)
    never materializes the global state on host — ocn_init leaves
    state=None and ocn_run region-reads each shard's rows — and the
    chained result is bit-exact against an unbroken run (the read-side
    PIO-decomposition parity, base/IO.h:256,305)."""
    from test_driver import _base_config, _perturb

    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run

    streams = {
        "RestartWrite": {"Filename": "restart.$SimTime", "Mode": "write",
                         "UsePointerFile": True,
                         "PointerFilename": "ocn.pointer",
                         "IfExists": "replace", "Freq": 10,
                         "FreqUnits": "minutes", "Format": "hdf5",
                         "Contents": ["Restart"]},
        "RestartRead": {"Mode": "read", "UsePointerFile": True,
                        "PointerFilename": "ocn.pointer",
                        "Freq": 1, "FreqUnits": "OnStartup",
                        "Contents": ["Restart"]},
    }

    def cfgfile(d, stop):
        p = _base_config(d, stop=stop, streams=streams)
        doc = yaml.safe_load(open(p))
        doc["Omega"]["Mesh"]["Generate"].update(Nx=8, Ny=16)
        doc["Omega"]["Decomp"] = {"NShards": 4, "ShardedIO": True,
                                  "Method": "structured"}
        yaml.safe_dump(doc, open(p, "w"))
        return p

    tmp = str(tmp_path)
    # ---- run 1: 0 -> 20 min (writes restarts at 10, 20) ----
    m1 = _perturb(ocn_init(config_file=cfgfile(tmp, "0001-01-01_00:20:00"),
                           directory=tmp))
    assert m1._deferred_state_stream is None     # no pointer file yet
    h0 = np.asarray(m1.state.h).copy()
    ocn_finalize(ocn_run(m1))
    assert os.path.exists(os.path.join(tmp, "ocn.pointer"))

    # ---- run 2: restart (deferred region read), 20 -> 40 min ----
    m2 = ocn_init(config_file=cfgfile(tmp, "0001-01-01_00:40:00"),
                  directory=tmp)
    assert m2._deferred_state_stream == "RestartRead"
    assert m2.state is None                      # nothing global on host
    assert str(m2.clock.get_current_time()) == "0001-01-01_00:20:00"
    st_chain = ocn_finalize(ocn_run(m2))

    # ---- control: unbroken 0 -> 40 with the same sharded stepping ----
    tmp2 = os.path.join(tmp, "ctl")
    os.makedirs(tmp2)
    mc = ocn_init(config_file=cfgfile(tmp2, "0001-01-01_00:40:00"),
                  directory=tmp2)
    K = mc.model_cfg.nvertlayers
    mc.state = mc.state._replace(h=jnp.asarray(h0))
    st_ctl = ocn_finalize(ocn_run(mc))

    for fld in ("h", "u", "tracers"):
        np.testing.assert_array_equal(np.asarray(getattr(st_chain, fld)),
                                      np.asarray(getattr(st_ctl, fld)),
                                      err_msg=fld)


def test_driver_sharded_io_matches_gathered(tmp_path):
    """A Decomp.ShardedIO run writes history + restart files whose
    contents equal the gathered-IO run's, and the restart chain keeps
    working (read path sees ordinary global arrays)."""
    from test_driver import _base_config, _perturb

    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run

    tmp = str(tmp_path)
    streams = {
        "History": {"Filename": "hist.$SimTime", "Mode": "write",
                    "IfExists": "replace", "Freq": 10,
                    "FreqUnits": "minutes",
                    "Contents": ["State", "SshCell"]},
    }
    cfg_path = _base_config(tmp, stop="0001-01-01_00:20:00",
                            streams=streams)
    doc = yaml.safe_load(open(cfg_path))
    doc["Omega"]["Mesh"]["Generate"].update(Nx=8, Ny=16)
    doc["Omega"]["Decomp"] = {"NShards": 4, "ShardedIO": True}
    yaml.safe_dump(doc, open(cfg_path, "w"))

    mA = _perturb(ocn_init(config_file=cfg_path, directory=tmp))
    h0 = mA.state.h
    stA = ocn_finalize(ocn_run(mA))
    files_sharded = sorted(f for f in os.listdir(tmp)
                           if f.startswith("hist"))
    assert files_sharded
    ncA = read_netcdf(os.path.join(tmp, files_sharded[-1]))

    # same run with gathered IO into a second directory
    tmp2 = os.path.join(tmp, "gathered")
    os.makedirs(tmp2)
    cfg2 = _base_config(tmp2, stop="0001-01-01_00:20:00", streams=streams)
    doc = yaml.safe_load(open(cfg2))
    doc["Omega"]["Mesh"]["Generate"].update(Nx=8, Ny=16)
    doc["Omega"]["Decomp"] = {"NShards": 4, "ShardedIO": False}
    yaml.safe_dump(doc, open(cfg2, "w"))
    mB = ocn_init(config_file=cfg2, directory=tmp2)
    mB.state = mB.state._replace(h=h0)
    stB = ocn_finalize(ocn_run(mB))
    ncB = read_netcdf(os.path.join(
        tmp2, sorted(f for f in os.listdir(tmp2)
                     if f.startswith("hist"))[-1]))

    for v in ("LayerThickness", "NormalVelocity", "SshCell"):
        np.testing.assert_allclose(np.asarray(ncA.get(v)),
                                   np.asarray(ncB.get(v)),
                                   rtol=0, atol=0, err_msg=v)
