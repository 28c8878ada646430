"""Analysis subsystem: energy/enstrophy/budget monitors.

The TRiSK discretization conserves total energy (Ringler et al. 2010
section 5); volume and tracer content are conserved by the flux-form
updates. These tests pin those properties through omega_tpu.analysis
and the driver's Analysis config group.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import yaml

from omega_tpu.analysis import EnergeticsMonitor, energetics, mean_ssh
from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import forward_backward_step, rk4_step, run_steps


def _inviscid_setup(nx=24, dc=50.0e3, K=2):
    mesh = planar_hex_mesh(nx, nx, dc=dc, f0=1.0e-4, bottom_depth=1000.0)
    cfg = ModelConfig(
        nvertlayers=K, ntracers=0,
        tendencies=TendencyConfig(
            velocity_diffusion=False, velocity_hyperdiff=False,
            tracer_horz_adv=False, tracer_diffusion=False,
            tracer_hyperdiff=False))
    kx = 2 * np.pi / mesh.x_period
    ky = 2 * np.pi / mesh.y_period
    ssh = 1.0 * np.sin(kx * np.asarray(mesh.x_cell)) * \
        np.sin(ky * np.asarray(mesh.y_cell))
    h = jnp.asarray(1000.0 + ssh[:, None]) * jnp.ones((1, K))
    st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K)),
                    tracers=jnp.zeros((0, mesh.ncells, K)))
    return mesh, cfg, st


def test_energy_conservation_rk4():
    """Total energy (KE + PE about the initial mean ssh) is conserved by
    the inviscid TRiSK + RK4 system to time-discretization error, while
    KE and PE individually exchange O(1) of the perturbation energy."""
    mesh, cfg, st = _inviscid_setup()
    ref = mean_ssh(mesh, cfg, st)
    e0 = energetics(mesh, cfg, st, ref)
    out = jax.block_until_ready(
        jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, 200.0, 60,
                                    stepper=rk4_step))(st))
    e1 = energetics(mesh, cfg, out, ref)

    assert abs(e1["volume"] - e0["volume"]) / e0["volume"] < 1e-13
    # real KE<->PE exchange happened (the initial state is mostly
    # geostrophic — only the wave part of the energy sloshes)
    assert e1["kinetic_energy"] > 0.02 * e0["potential_energy"]
    drift = abs(e1["total_energy"] - e0["total_energy"]) \
        / e0["total_energy"]
    # residual drift is RK4 time error (measured 1.3e-5 at dt=200 s;
    # test_energy_drift_converges_with_dt pins the dt-dependence)
    assert drift < 5e-5, f"energy drift {drift:.2e}"
    # potential enstrophy stays bounded (not a conserved quantity of the
    # energy-conserving PV flux; gate generously)
    assert abs(e1["potential_enstrophy"] / e0["potential_enstrophy"]
               - 1.0) < 0.05


def test_energy_drift_converges_with_dt():
    """The FB stepper's energy drift is time-discretization error: it
    must shrink when dt is halved (steps doubled, same horizon)."""
    mesh, cfg, st = _inviscid_setup(nx=16)
    ref = mean_ssh(mesh, cfg, st)
    e0 = energetics(mesh, cfg, st, ref)["total_energy"]

    def drift(dt, n):
        out = run_steps(mesh, cfg, st, 0.0, dt, n,
                        stepper=forward_backward_step)
        return abs(energetics(mesh, cfg, out, ref)["total_energy"] - e0) / e0

    d1 = drift(400.0, 30)
    d2 = drift(200.0, 60)
    assert d2 < 0.75 * d1, (d1, d2)


def test_driver_analysis_stream(tmp_path):
    """Config-driven Analysis group: CSV lands with the t=0 row plus one
    per cadence, volume/tracer-mass columns constant to roundoff."""
    tmp = str(tmp_path)
    doc = {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "RungeKutta4",
            "TimeStep": "0000_00:02:00", "StartTime": "0001-01-01_00:00:00",
            "StopTime": "0001-01-01_00:40:00", "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "planar", "Nx": 16, "Ny": 16,
                              "Dc": 5000.0, "F0": 1.0e-4,
                              "BottomDepth": 1000.0}},
        "VertCoord": {"NVertLayers": 3},
        "Tracers": {"Base": ["Temperature", "Salinity"]},
        "Tendencies": {"VelDiffTendencyEnable": True, "ViscDel2": 1.0e3,
                       "VelHyperDiffTendencyEnable": False},
        "Analysis": {"Enabled": True, "Freq": 10, "FreqUnits": "minutes",
                     "Filename": "energetics.csv"},
        "IOStreams": {}}}
    p = os.path.join(tmp, "omega.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)

    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run
    model = ocn_init(config_file=p, directory=tmp)
    kx = 2 * np.pi / model.mesh.x_period
    ssh = np.sin(kx * np.asarray(model.mesh.x_cell))
    model.state = model.state._replace(
        h=jnp.asarray((1000.0 + ssh[:, None]) / 3) * jnp.ones((1, 3)))
    model = ocn_run(model)
    ocn_finalize(model)

    path = os.path.join(tmp, "energetics.csv")
    with open(path) as f:
        lines = f.read().strip().split("\n")
    header = lines[0].split(",")
    rows = [dict(zip(header, ln.split(","))) for ln in lines[1:]]
    assert len(rows) == 5                 # t=0 + 10/20/30/40 minutes
    assert rows[0]["time"].endswith("00:00:00")
    assert rows[-1]["time"].endswith("00:40:00")
    vol = np.array([float(r["volume"]) for r in rows])
    np.testing.assert_allclose(vol, vol[0], rtol=1e-13)
    m0 = np.array([float(r["tracer0_mass"]) for r in rows])
    np.testing.assert_allclose(m0, m0[0], rtol=1e-12)
    en = np.array([float(r["total_energy"]) for r in rows])
    decay = (en[0] - en[-1]) / en[0]
    assert 0.0 <= decay < 0.05, decay     # viscosity dissipates, mildly


@pytest.mark.parametrize("path", ["sfc", "structured"])
def test_sharded_energetics_matches_gathered(path):
    """The shard_map'd energetics sampler (owned-masked double-double
    reductions per shard, analysis.energetics_local) matches the
    gathered-global computation to reduction roundoff on both
    decomposition paths — no global state at the sample boundary."""
    mesh = planar_hex_mesh(16, 16, dc=50.0e3, f0=1.0e-4,
                           bottom_depth=1000.0)
    K, L = 3, 2
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1.0,
                                                visc_del4=1e6))
    rng = np.random.default_rng(3)
    kx = 2 * np.pi / mesh.x_period
    ssh = np.sin(kx * np.asarray(mesh.x_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K) * jnp.ones((1, K))
    st = ModelState(
        h=h, u=jnp.asarray(0.05 * rng.standard_normal((mesh.nedges, K))),
        tracers=jnp.asarray(10.0 + rng.standard_normal((L, mesh.ncells,
                                                        K))))
    ref_ssh = mean_ssh(mesh, cfg, st)
    ref = dict(sorted(energetics(mesh, cfg, st, ref_ssh).items()))

    from omega_tpu.parallel.sharded import default_device_mesh
    dmesh = default_device_mesh(8)
    if path == "sfc":
        from omega_tpu.parallel import decompose, shard_state
        from omega_tpu.parallel.sharded import make_sharded_energetics
        sm = decompose(mesh, 8)
        sst = shard_state(sm, st)
        sample = make_sharded_energetics(sm, cfg, dmesh)
    else:
        from omega_tpu.parallel import structured_shard as sshard
        ss = sshard.decompose_structured(mesh, 8, layout=(4, 2))
        sst = sshard.shard_state(ss, st)
        sample = sshard.make_sharded_energetics(ss, cfg, dmesh)

    row, ssh_ref = sample(sst)
    assert abs(ssh_ref - ref_ssh) < 1e-12 * max(1.0, abs(ref_ssh))
    assert sorted(row) == sorted(ref)
    for k in ref:
        scale = abs(ref[k]) + 1e-300
        assert abs(row[k] - ref[k]) / scale < 1e-12, (k, row[k], ref[k])
