"""Wind forcing and bottom drag tendency tests
(WindForcingOnEdge TendencyTerms.h:281-305, BottomDragOnEdge :308-340,
WindForcingAuxVars.h:13-40)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.core import aux as auxmod
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import forward_backward_step, run_steps


def _setup(K=3, **tflags):
    mesh = planar_hex_mesh(8, 8, dc=25000.0, f0=0.0, bottom_depth=1000.0)
    cfg = ModelConfig(
        nvertlayers=K, ntracers=1,
        tendencies=TendencyConfig(
            pv_advection=False, ke_gradient=False, ssh_gradient=False,
            visc_del2=0.0, velocity_diffusion=False,
            velocity_hyperdiff=False, tracer_horz_adv=False,
            tracer_diffusion=False, tracer_hyperdiff=False, **tflags))
    h = (1000.0 / K) * jnp.ones((mesh.ncells, K))
    st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K)),
                    tracers=10.0 + jnp.zeros((1, mesh.ncells, K)))
    return mesh, cfg, st


@pytest.mark.parametrize("interp", ["isotropic", "anisotropic"])
def test_wind_normal_stress_rotation(interp):
    """Uniform zonal stress projects onto edges as tau * cos(angleEdge)."""
    mesh, cfg, _ = _setup()
    import dataclasses
    cfg = dataclasses.replace(cfg, wind_interp_type=interp)
    tau = 0.1
    zonal = tau * jnp.ones(mesh.ncells)
    merid = jnp.zeros(mesh.ncells)
    ns = np.asarray(auxmod.wind_normal_stress(mesh, cfg, zonal, merid))
    np.testing.assert_allclose(ns, tau * np.cos(np.asarray(mesh.angle_edge)),
                               atol=1e-12)


def test_wind_forcing_accelerates_top_layer():
    mesh, cfg, st = _setup(wind_forcing=True, density0=1026.0)
    tau = 0.1
    wind = (tau * jnp.ones(mesh.ncells), jnp.zeros(mesh.ncells))
    dt, n = 600.0, 10
    out = jax.block_until_ready(jax.jit(lambda s: run_steps(
        mesh, cfg, s, 0.0, dt, n, wind_stress=wind))(st))
    u = np.asarray(out.u)
    # expected top-layer du = dt*n * tau cos(angle) / (rho0 h_top)
    h_top = 1000.0 / 3
    expect = dt * n * tau * np.cos(np.asarray(mesh.angle_edge)) / \
        (1026.0 * h_top)
    np.testing.assert_allclose(u[:, 0], expect, rtol=1e-10)
    # deeper layers untouched
    assert np.abs(u[:, 1:]).max() == 0.0


def test_bottom_drag_decelerates_bottom_layer():
    mesh, cfg, st = _setup(bottom_drag=True, bottom_drag_coeff=3.0e-3)
    u0 = 0.5 * jnp.ones((mesh.nedges, 3))
    st = st._replace(u=u0)
    out = forward_backward_step(mesh, cfg, st, 0.0, 600.0)
    u = np.asarray(out.u)
    # bottom layer slowed, others unchanged
    assert (u[:, -1] < 0.5 - 1e-6).all()
    np.testing.assert_allclose(u[:, :-1], 0.5, rtol=1e-12)
    # magnitude: du = -dt cd |u| u / h_bot with |u| from cell KE average
    # (order check only — KE-based speed differs from |u_e| on edges)
    du = 0.5 - u[:, -1]
    h_bot = 1000.0 / 3
    scale = 600.0 * 3.0e-3 * 0.5 * 0.5 / h_bot
    assert 0.2 * scale < du.mean() < 5.0 * scale
