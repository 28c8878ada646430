"""Coupled-mode component tests.

The reference's coupled configuration is roadmap (MachEnv accepts a
coupler communicator, base/MachEnv.h:136-142, but no MCT/MOAB wiring
exists); omega_tpu.coupling implements the component contract that
wiring would target.  Tests: the import/export round trip, clock
exactness across intervals, equivalence with an uninterrupted driver
run, and the cell-velocity reconstruction.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import yaml

from omega_tpu.coupling import OmegaComponent, reconstruct_cell_velocity
from omega_tpu.mesh import planar_hex_mesh


def test_reconstruct_uniform_flow_exact():
    """A uniform velocity field reconstructs exactly at cell centers
    (both edge projections are exact for constant vectors)."""
    mesh = planar_hex_mesh(16, 16, dc=1000.0)
    V = np.array([0.3, -0.7])
    ang = np.asarray(mesh.angle_edge)
    un = V[0] * np.cos(ang) + V[1] * np.sin(ang)
    uz, vm = reconstruct_cell_velocity(mesh, jnp.asarray(un[:, None]))
    np.testing.assert_allclose(np.asarray(uz), V[0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vm), V[1], rtol=1e-12)


def test_reconstruct_solid_body_sphere():
    """Solid-body rotation on the sphere reconstructs the zonal flow to
    a few percent at icos8 (low-order average, smooth field)."""
    from omega_tpu.mesh.spherical import spherical_icos_mesh
    mesh = spherical_icos_mesh(8)
    U0 = 1.0
    ang = np.asarray(mesh.angle_edge)
    un = (U0 * np.cos(np.asarray(mesh.lat_edge)) * np.cos(ang))[:, None]
    uz, vm = reconstruct_cell_velocity(mesh, jnp.asarray(un))
    expect = U0 * np.cos(np.asarray(mesh.lat_cell))
    err = np.abs(np.asarray(uz)[:, 0] - expect).max()
    assert err < 0.1 * U0, err            # worst cells: the 12 pentagons
    assert np.abs(np.asarray(vm)).max() < 0.1 * U0


def _coupled_config(tmp, stop_minutes=40):
    return {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "Forward-Backward",
            "TimeStep": "0000_00:02:00",
            "StartTime": "0001-01-01_00:00:00",
            "StopTime": f"0001-01-01_00:{stop_minutes}:00",
            "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "planar", "Nx": 16, "Ny": 16,
                              "Dc": 5000.0, "F0": 1.0e-4,
                              "BottomDepth": 1000.0}},
        "VertCoord": {"NVertLayers": 3},
        "Tracers": {"Base": ["Temperature", "Salinity"]},
        "Tendencies": {
            "WindForcingTendencyEnable": True,
            "BottomDragTendencyEnable": True, "BottomDragCoeff": 1.0e-3,
            "VelDiffTendencyEnable": True, "ViscDel2": 1.0e3,
            "VelHyperDiffTendencyEnable": False,
            "TracerDiffTendencyEnable": False,
            "TracerHyperDiffTendencyEnable": False},
        "IOStreams": {}}}


def test_component_intervals_match_uninterrupted_run(tmp_path):
    """Four 10-minute coupling intervals with constant wind imports give
    the same state as one 40-minute config-driven run with the same
    constant wind, and the exact-rational clock lands on StopTime."""
    tmp = str(tmp_path)
    doc = _coupled_config(tmp)
    p = os.path.join(tmp, "omega.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)

    comp = OmegaComponent(config_file=p, directory=tmp)
    imports = {"zonal_wind_stress": 0.05, "merid_wind_stress": 0.01}
    for _ in range(4):
        ex = comp.run(600.0, imports)
    assert comp.clock_time.startswith("0001-01-01_00:40:00")
    state_c = comp.finalize()

    # reference: uninterrupted driver run with the same constant wind
    doc2 = _coupled_config(tmp)
    doc2["Omega"]["WindStress"] = {"InterpType": "Isotropic",
                                   "ConstantZonal": 0.05,
                                   "ConstantMeridional": 0.01}
    p2 = os.path.join(tmp, "omega2.yml")
    with open(p2, "w") as f:
        yaml.safe_dump(doc2, f)
    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run
    model = ocn_init(config_file=p2, directory=tmp)
    model = ocn_run(model)
    state_r = ocn_finalize(model)

    np.testing.assert_allclose(np.asarray(state_c.h),
                               np.asarray(state_r.h), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(state_c.u),
                               np.asarray(state_r.u), rtol=0, atol=1e-12)

    # exports are self-consistent with the final state
    assert set(ex) == {"ssh", "sst", "sss", "u_zonal", "v_merid"}
    np.testing.assert_allclose(
        ex["ssh"], np.asarray(state_c.h).sum(axis=1) - 1000.0, atol=1e-10)
    assert np.abs(ex["u_zonal"]).max() > 0


def test_component_import_validation(tmp_path):
    """Wind imports without the wind tendency enabled are rejected, and
    unknown import names raise."""
    tmp = str(tmp_path)
    doc = _coupled_config(tmp)
    doc["Omega"]["Tendencies"]["WindForcingTendencyEnable"] = False
    p = os.path.join(tmp, "omega.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)
    comp = OmegaComponent(config_file=p, directory=tmp)
    with pytest.raises(ValueError, match="WindForcing"):
        comp.run(600.0, {"zonal_wind_stress": 0.05})
    with pytest.raises(ValueError, match="unknown import"):
        comp.run(600.0, {"sea_ice_fraction": 0.5})
    comp.run(600.0)          # no imports: plain advance works
    assert comp.clock_time.startswith("0001-01-01_00:10:00")


@pytest.mark.parametrize("method", ["sfc", "structured"])
def test_component_sharded_exports_no_gather(tmp_path, method):
    """NShards=8 coupled run: the state stays SHARDED across coupling
    intervals (no global gather in the export path) and the shard_map'd
    owned-row exports match a single-shard run's exports."""
    tmp = str(tmp_path)
    doc = _coupled_config(tmp, stop_minutes=20)
    doc["Omega"]["Decomp"] = {"NShards": 8, "Method": method}
    p = os.path.join(tmp, "omega8.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)
    comp = OmegaComponent(config_file=p, directory=tmp)
    imports = {"zonal_wind_stress": 0.05, "merid_wind_stress": 0.01}
    ex8 = comp.run(600.0, imports)
    # the state was never gathered: still stacked (S, Cl, K)
    assert getattr(comp.model, "_state_is_sharded", False)
    assert comp.model.state.h.ndim == 3
    assert comp.model.state.h.shape[0] == 8
    ex8b = comp.run(600.0, imports)
    assert getattr(comp.model, "_state_is_sharded", False)
    comp.finalize()

    # reference: the same run on one shard (global exports path)
    doc1 = _coupled_config(tmp, stop_minutes=20)
    p1 = os.path.join(tmp, "omega1.yml")
    with open(p1, "w") as f:
        yaml.safe_dump(doc1, f)
    comp1 = OmegaComponent(config_file=p1, directory=tmp)
    ex1 = comp1.run(600.0, imports)
    ex1b = comp1.run(600.0, imports)
    comp1.finalize()

    assert set(ex8) == set(ex1)
    for k in ex1:
        np.testing.assert_allclose(ex8[k], ex1[k], rtol=0, atol=1e-12,
                                   err_msg=k)
        np.testing.assert_allclose(ex8b[k], ex1b[k], rtol=0, atol=1e-12,
                                   err_msg=k)
