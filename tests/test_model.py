"""End-to-end dycore tests: conservation and manufactured-solution accuracy.

Mirrors the reference's correctness gates (doc/design/OmegaV0ShallowWater.md:
57-67): volume and tracer conservation to machine precision, and convergence
against the Bishnu et al. manufactured solution (the reference's
ManufacturedSolutionTendency custom term, ocn/CustomTendencyTerms.cpp).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.core.config import ManufacturedConfig
from omega_tpu.core import manufactured
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import (forward_backward_step, make_stepper, rk2_step,
                                rk4_step, run_steps)


def _inertia_gravity_setup(nx=16, dc=5000.0, nlayers=3, ntracers=2):
    mesh = planar_hex_mesh(nx, nx, dc=dc, f0=1e-4, bottom_depth=1000.0)
    cfg = ModelConfig(
        nvertlayers=nlayers, ntracers=ntracers,
        tendencies=TendencyConfig(
            visc_del2=0.0, velocity_diffusion=False,
            velocity_hyperdiff=False, tracer_diffusion=True,
            eddy_diff2=10.0, tracer_hyperdiff=False),
    )
    kx = 2 * np.pi / mesh.x_period
    ky = 2 * np.pi / mesh.y_period
    ssh = 1.0 * np.sin(kx * np.asarray(mesh.x_cell)) * \
        np.sin(ky * np.asarray(mesh.y_cell))
    h0 = 1000.0 / nlayers
    h = jnp.asarray(h0 + ssh[:, None] / nlayers) * jnp.ones((1, nlayers))
    u = jnp.zeros((mesh.nedges, nlayers))
    tr_base = 10.0 + np.cos(kx * np.asarray(mesh.x_cell))
    tr = jnp.stack([jnp.asarray(tr_base[:, None]) * jnp.ones((1, nlayers)),
                    20.0 * jnp.ones((mesh.ncells, nlayers))])
    state = ModelState(h=h, u=u, tracers=tr)
    return mesh, cfg, state


@pytest.mark.parametrize("stepper", [forward_backward_step, rk2_step, rk4_step])
def test_conservation(stepper):
    """Total volume and tracer content conserved to machine precision
    (OmegaV0ShallowWater.md:65-67)."""
    mesh, cfg, state = _inertia_gravity_setup()
    area = np.asarray(mesh.area_cell)[:, None]

    vol0 = np.sum(area * np.asarray(state.h))
    tr0 = np.sum(area * np.asarray(state.h) * np.asarray(state.tracers), axis=(1, 2))

    out = run_steps(mesh, cfg, state, 0.0, 60.0, 20, stepper=stepper)
    out = jax.block_until_ready(out)

    vol1 = np.sum(area * np.asarray(out.h))
    tr1 = np.sum(area * np.asarray(out.h) * np.asarray(out.tracers), axis=(1, 2))

    assert abs(vol1 - vol0) / vol0 < 1e-13
    np.testing.assert_allclose(tr1, tr0, rtol=1e-12)
    # state stayed finite and moved
    assert np.isfinite(np.asarray(out.u)).all()
    assert np.abs(np.asarray(out.u)).max() > 0


def test_constant_tracer_stays_constant():
    """A uniform tracer must remain exactly uniform under thickness-weighted
    advection (consistency of tracer and thickness transport)."""
    mesh, cfg, state = _inertia_gravity_setup()
    out = run_steps(mesh, cfg, state, 0.0, 60.0, 10, stepper=forward_backward_step)
    tr1 = np.asarray(out.tracers)[1]
    np.testing.assert_allclose(tr1, 20.0, rtol=1e-12)


def _manufactured_setup(nx, stepper_dt=None):
    Lx = 5.0e6
    dc = Lx / nx
    ny = nx
    mesh = planar_hex_mesh(nx, ny, dc=dc, f0=1e-4, bottom_depth=1000.0)
    mcfg = ManufacturedConfig(wavelength_x=mesh.x_period,
                              wavelength_y=mesh.y_period, amplitude=2.0)
    cfg = ModelConfig(
        nvertlayers=1, ntracers=0,
        manufactured=mcfg,
        tendencies=TendencyConfig(
            velocity_diffusion=True, visc_del2=0.0,
            velocity_hyperdiff=False, visc_del4=0.0,
            tracer_horz_adv=False, tracer_diffusion=False,
            tracer_hyperdiff=False,
            use_custom_tendency=True, manufactured_tendency=True),
    )
    p = manufactured.make_params(cfg, 1000.0)
    h = 1000.0 + manufactured.exact_ssh(p, mesh.x_cell, mesh.y_cell, 0.0)[:, None]
    u = manufactured.exact_normal_velocity(p, mesh, 0.0)[:, None]
    state = ModelState(h=jnp.asarray(h), u=jnp.asarray(u),
                       tracers=jnp.zeros((0, mesh.ncells, 1)))
    return mesh, cfg, p, state


def _manufactured_error(nx, nsteps, dt):
    mesh, cfg, p, state = _manufactured_setup(nx)
    out = run_steps(mesh, cfg, state, 0.0, dt, nsteps, stepper=rk4_step)
    t_end = nsteps * dt
    ssh_exact = np.asarray(manufactured.exact_ssh(
        p, mesh.x_cell, mesh.y_cell, t_end))
    ssh = np.asarray(out.h)[:, 0] - 1000.0
    area = np.asarray(mesh.area_cell)
    return np.sqrt(np.sum(area * (ssh - ssh_exact) ** 2)
                   / np.sum(area * ssh_exact ** 2))


def test_manufactured_solution_convergence():
    """SSH L2 error vs the exact manufactured solution converges at ~2nd
    order in space (the reference's Polaris manufactured-solution gate)."""
    # fixed time horizon, dt scaled with dx (RK4 time error negligible)
    horizon = 2400.0
    e16 = _manufactured_error(16, 8, horizon / 8)
    e32 = _manufactured_error(32, 16, horizon / 16)
    order = np.log2(e16 / e32)
    assert e16 < 0.1, f"coarse error too large: {e16}"
    assert order > 1.5, f"manufactured-solution order {order:.2f} < 1.5"


@pytest.mark.parametrize("name,expected", [
    ("Forward-Backward", forward_backward_step),
    ("RungeKutta2", rk2_step),
    ("RungeKutta4", rk4_step),
])
def test_make_stepper(name, expected):
    assert make_stepper(name) is expected


def test_stepper_temporal_order():
    """Temporal convergence on the manufactured solution at fixed mesh:
    halving dt must reduce the (time-dominated) error per the stepper order.
    Analogue of test/timeStepping/TimeStepperTest.cpp."""
    mesh, cfg, p, state0 = _manufactured_setup(16)

    def err(stepper, dt, nsteps):
        out = run_steps(mesh, cfg, state0, 0.0, dt, nsteps, stepper=stepper)
        # compare against a tiny-dt RK4 run (same spatial discretization),
        # isolating the time error from the spatial error
        ref = run_steps(mesh, cfg, state0, 0.0, dt / 8, nsteps * 8,
                        stepper=rk4_step)
        return float(jnp.sqrt(jnp.mean((out.h - ref.h) ** 2)))

    horizon = 1600.0
    orders = {}
    # FB is 1st order and needs finer dt to reach its asymptotic range
    for stepper, name, n1, n2 in [(forward_backward_step, "fb", 16, 32),
                                  (rk2_step, "rk2", 4, 8),
                                  (rk4_step, "rk4", 4, 8)]:
        e1 = err(stepper, horizon / n1, n1)
        e2 = err(stepper, horizon / n2, n2)
        orders[name] = np.log2(e1 / e2)
    assert orders["fb"] > 0.85, orders
    assert orders["rk2"] > 1.6, orders
    assert orders["rk4"] > 3.2, orders


@pytest.mark.parametrize("thick_type,tracer_type",
                         [("upwind", "upwind"), ("upwind", "center")])
def test_upwind_flux_options(thick_type, tracer_type):
    """FluxThicknessType/FluxTracerType 'Upwind' (LayerThicknessAuxVars.h
    center/upwind options): conservative and stable."""
    mesh, cfg, state = _inertia_gravity_setup()
    cfg = dataclasses.replace(cfg, flux_thickness_type=thick_type,
                              flux_tracer_type=tracer_type)
    area = np.asarray(mesh.area_cell)[:, None]
    vol0 = np.sum(area * np.asarray(state.h))
    tr0 = np.sum(area * np.asarray(state.h) * np.asarray(state.tracers),
                 axis=(1, 2))
    out = jax.block_until_ready(run_steps(mesh, cfg, state, 0.0, 60.0, 20))
    vol1 = np.sum(area * np.asarray(out.h))
    tr1 = np.sum(area * np.asarray(out.h) * np.asarray(out.tracers),
                 axis=(1, 2))
    assert abs(vol1 - vol0) / vol0 < 1e-13
    np.testing.assert_allclose(tr1, tr0, rtol=1e-12)
    assert np.isfinite(np.asarray(out.u)).all()
