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
