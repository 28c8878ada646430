"""Vertical mixing wired into the time steppers via VertMix config."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.core.config import VertMixConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import forward_backward_step, rk4_step, run_steps


def _setup(vm, K=6):
    mesh = planar_hex_mesh(8, 8, dc=25000.0, f0=1e-4, bottom_depth=1200.0)
    cfg = ModelConfig(
        nvertlayers=K, ntracers=2, vert_mix=vm,
        tendencies=TendencyConfig(visc_del2=0.0, velocity_diffusion=False,
                                  velocity_hyperdiff=False,
                                  tracer_diffusion=False,
                                  tracer_hyperdiff=False))
    kx = 2 * np.pi / mesh.x_period
    ssh = np.sin(kx * np.asarray(mesh.x_cell))
    h = jnp.asarray((1200.0 + ssh[:, None]) / K) * jnp.ones((1, K))
    # vertically sheared velocity and stratified tracer
    shear = jnp.asarray(np.linspace(0.1, -0.1, K)[None, :]
                        * np.ones((mesh.nedges, 1)))
    tprof = jnp.asarray(np.linspace(20.0, 4.0, K)[None, :]
                        * np.ones((mesh.ncells, 1)))
    tr = jnp.stack([tprof, 35.0 * jnp.ones((mesh.ncells, K))])
    return mesh, cfg, ModelState(h=h, u=shear, tracers=tr)


@pytest.mark.parametrize("stepper", [forward_backward_step, rk4_step])
def test_vmix_conserves_and_smooths(stepper):
    vm = VertMixConfig(enabled=True, kappa_tracer=1e-2, kappa_momentum=1e-2)
    mesh, cfg, st = _setup(vm)
    area = np.asarray(mesh.area_cell)[:, None]
    heat0 = np.sum(area * np.asarray(st.h) * np.asarray(st.tracers[0]))
    out = jax.block_until_ready(jax.jit(lambda s: run_steps(
        mesh, cfg, s, 0.0, 60.0, 30, stepper=stepper))(st))
    heat1 = np.sum(area * np.asarray(out.h) * np.asarray(out.tracers[0]))
    assert abs(heat1 - heat0) / abs(heat0) < 1e-12   # conservative
    # vertical variance of T and shear of u must decrease
    var0 = float(np.var(np.asarray(st.tracers[0]), axis=1).mean())
    var1 = float(np.var(np.asarray(out.tracers[0]), axis=1).mean())
    assert var1 < var0
    sh0 = float(np.abs(np.diff(np.asarray(st.u), axis=1)).mean())
    sh1 = float(np.abs(np.diff(np.asarray(out.u), axis=1)).mean())
    assert sh1 < sh0


def test_vmix_disabled_is_identity():
    vm_off = VertMixConfig(enabled=False)
    mesh, cfg_off, st = _setup(vm_off)
    out_off = forward_backward_step(mesh, cfg_off, st, 0.0, 60.0)
    vm_tiny = VertMixConfig(enabled=True, kappa_tracer=0.0,
                            kappa_momentum=0.0)
    _, cfg_tiny, _ = _setup(vm_tiny)
    out_tiny = forward_backward_step(mesh, cfg_tiny, st, 0.0, 60.0)
    np.testing.assert_allclose(np.asarray(out_off.tracers),
                               np.asarray(out_tiny.tracers), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_off.u),
                               np.asarray(out_tiny.u), rtol=1e-12)


def test_vmix_from_yaml():
    from omega_tpu.core.config import model_config_from_yaml
    from omega_tpu.infra.config import Config
    c = Config.from_yaml("""
Omega:
  Tendencies: {}
  VertMix:
    Enabled: true
    KappaTracer: 2.0e-3
    KappaMomentum: 1.0e-3
    Method: thomas
""")
    mc = model_config_from_yaml(c, 4, 2)
    assert mc.vert_mix.enabled and mc.vert_mix.kappa_tracer == 2.0e-3
    assert mc.vert_mix.method == "thomas"


def test_pp81_coefficients_limits():
    """PP81 closure limits: strong stable stratification with weak shear
    gives background-only mixing; strong shear with no stratification
    gives the Nu0-scale maximum (Pacanowski & Philander 1981)."""
    from omega_tpu.core import vmix
    mesh = planar_hex_mesh(8, 8, dc=25000.0, f0=1e-4, bottom_depth=1200.0)
    K = 6
    vm = VertMixConfig(enabled=True, scheme="pp81", nu0=1e-2,
                       kappa_tracer=1e-5, kappa_momentum=1e-4,
                       temp_index=0, salt_index=1)
    h = 200.0 * jnp.ones((mesh.ncells, K))
    S = 35.0 * jnp.ones((mesh.ncells, K))

    # stable T profile, nearly no shear -> Ri huge -> background only
    T = jnp.asarray(np.linspace(20.0, 4.0, K)[None, :]
                    * np.ones((mesh.ncells, 1)))
    u = 1e-6 * jnp.asarray(np.linspace(1.0, 0.0, K)[None, :]
                           * np.ones((mesh.nedges, 1)))
    kt, km = vmix.pp81_coefficients(mesh, vm, 9.80665, h, u,
                                    jnp.stack([T, S]))
    assert float(jnp.max(kt)) < 2.0 * vm.kappa_tracer
    assert float(jnp.max(km)) < 2.0 * vm.kappa_momentum

    # unstratified, strong shear -> Ri = 0 -> maximum mixing
    T0 = 10.0 * jnp.ones((mesh.ncells, K))
    u2 = jnp.asarray(np.linspace(0.5, -0.5, K)[None, :]
                     * np.ones((mesh.nedges, 1)))
    kt2, km2 = vmix.pp81_coefficients(mesh, vm, 9.80665, h, u2,
                                      jnp.stack([T0, S]))
    np.testing.assert_allclose(np.asarray(km2), vm.nu0 + vm.kappa_momentum,
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(kt2), vm.nu0 + vm.kappa_tracer,
                               rtol=1e-10)


def test_pp81_integration_conserves_and_localizes():
    """PP81 through the stepper: conservative, stable, and the mixing
    concentrates where the shear is (the top of the column here)."""
    vm = VertMixConfig(enabled=True, scheme="pp81", nu0=5e-2,
                       kappa_tracer=1e-6, kappa_momentum=1e-5,
                       temp_index=0, salt_index=1)
    mesh, cfg, st = _setup(vm, K=8)
    # strong shear confined to the top interface (Ri ~ 0.1 there, huge
    # below); stable stratification throughout
    prof = np.zeros(8)
    prof[0] = 2.0
    st = st._replace(u=jnp.asarray(prof[None, :]
                                   * np.ones((mesh.nedges, 1))))
    area = np.asarray(mesh.area_cell)[:, None]
    heat0 = np.sum(area * np.asarray(st.h) * np.asarray(st.tracers[0]))
    out = jax.block_until_ready(jax.jit(lambda s: run_steps(
        mesh, cfg, s, 0.0, 60.0, 30))(st))
    heat1 = np.sum(area * np.asarray(out.h) * np.asarray(out.tracers[0]))
    assert abs(heat1 - heat0) / abs(heat0) < 1e-12
    t0 = np.asarray(st.tracers[0])[0]
    t1 = np.asarray(out.tracers[0]).mean(axis=0)
    # the sheared top interface erodes measurably; the quiescent bottom
    # interface (Ri huge -> background kappa only) stays 10x+ more
    # intact — the localization that distinguishes PP81 from constants
    top = abs(abs(t1[0] - t1[1]) / abs(t0[0] - t0[1]) - 1.0)
    bot = abs(abs(t1[-1] - t1[-2]) / abs(t0[-1] - t0[-2]) - 1.0)
    assert top > 1e-3, (top, bot)
    assert top > 10.0 * bot, (top, bot)
    # T stays within its initial bounds (pure diffusion is monotone)
    assert t1.min() >= t0.min() - 1e-9 and t1.max() <= t0.max() + 1e-9


def test_pp81_from_yaml_and_driver_index_resolution(tmp_path):
    """Scheme parsing + the driver resolving T/S tracer rows."""
    import os
    import yaml
    from omega_tpu.driver import ocn_init
    doc = {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "Forward-Backward",
            "TimeStep": "0000_00:02:00", "StartTime": "0001-01-01_00:00:00",
            "StopTime": "0001-01-01_00:10:00", "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "planar", "Nx": 8, "Ny": 8,
                              "Dc": 25000.0, "BottomDepth": 1200.0}},
        "VertCoord": {"NVertLayers": 4},
        "Tracers": {"Base": ["Temperature", "Salinity"]},
        "VertMix": {"Enabled": True, "Scheme": "PP81", "Nu0": 0.02},
        "Tendencies": {}, "IOStreams": {}}}
    p = os.path.join(str(tmp_path), "omega.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)
    model = ocn_init(config_file=p, directory=str(tmp_path))
    vm = model.model_cfg.vert_mix
    assert vm.scheme == "pp81" and vm.nu0 == 0.02
    assert vm.temp_index == model.tracers.get_index("Temperature") >= 0
    assert vm.salt_index == model.tracers.get_index("Salinity") >= 0
