"""Science validation: exact-solution shallow-water test cases.

The reference's system/science tests live in the external Polaris
framework (SURVEY.md section 4; doc/design/OmegaV0ShallowWater.md:624-711
names the inertia-gravity wave and the Williamson suites).  This file
brings the same gates in-repo:

  * exact linear inertia-gravity wave dispersion on the f-plane
    (the Polaris `inertial_gravity_wave` case; also the configuration of
    the reference's perf protocol, OmegaV0ShallowWater.md:683),
  * Williamson et al. (1992) test case 2 — steady geostrophic flow on
    the rotating sphere (global balance incl. vertex Coriolis/PV path),
  * a Williamson-1-flavored cosine-bell tracer transported by the
    balanced solid-body flow, with FCT monotonicity bounds.

All cases assert convergence with resolution against closed-form
solutions — absolute accuracy, not pinned regression constants.
"""

import dataclasses

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.stepping import rk4_step, run_steps

GRAV = 9.80616


# ----------------------------------------------------------------------
# 1. inertia-gravity wave (planar, f-plane): exact linear dispersion

def _igw_exact(mesh, H, A, f0, t):
    """Exact linear plane-wave solution eta, (u, v) with one wavelength
    per period in x and y: omega^2 = f^2 + g H (k^2 + l^2)."""
    k = 2 * np.pi / mesh.x_period
    l = 2 * np.pi / mesh.y_period
    omega = np.sqrt(f0 * f0 + GRAV * H * (k * k + l * l))

    def eta(x, y):
        return A * np.cos(k * x + l * y - omega * t)

    def uv(x, y):
        th = k * x + l * y - omega * t
        c = A * GRAV / (omega * omega - f0 * f0)
        u = c * (omega * k * np.cos(th) - f0 * l * np.sin(th))
        v = c * (omega * l * np.cos(th) + f0 * k * np.sin(th))
        return u, v

    return eta, uv, 2 * np.pi / omega


def _igw_error(nx, dc, nsteps_per_period):
    """L2 SSH error vs the exact wave after one full period."""
    H, A, f0 = 1000.0, 1.0e-3, 1.0e-4
    mesh = planar_hex_mesh(nx, nx, dc=dc, f0=f0, bottom_depth=H)
    cfg = ModelConfig(
        nvertlayers=1, ntracers=0,
        tendencies=TendencyConfig(
            velocity_diffusion=False, velocity_hyperdiff=False,
            tracer_horz_adv=False, tracer_diffusion=False,
            tracer_hyperdiff=False))
    eta0, uv0, period = _igw_exact(mesh, H, A, f0, 0.0)
    xc, yc = np.asarray(mesh.x_cell), np.asarray(mesh.y_cell)
    xe, ye = np.asarray(mesh.x_edge), np.asarray(mesh.y_edge)
    ang = np.asarray(mesh.angle_edge)
    u, v = uv0(xe, ye)
    un = u * np.cos(ang) + v * np.sin(ang)
    state = ModelState(
        h=jnp.asarray(H + eta0(xc, yc))[:, None],
        u=jnp.asarray(un)[:, None],
        tracers=jnp.zeros((0, mesh.ncells, 1)))

    dt = period / nsteps_per_period
    out = run_steps(mesh, cfg, state, 0.0, dt, nsteps_per_period,
                    stepper=rk4_step)
    eta1, _, _ = _igw_exact(mesh, H, A, f0, period)
    err = np.asarray(out.h)[:, 0] - H - eta1(xc, yc)
    area = np.asarray(mesh.area_cell)
    return np.sqrt(np.sum(area * err ** 2) / np.sum(area * A ** 2))


def test_inertia_gravity_wave_dispersion_convergence():
    """SSH L2 error vs the EXACT inertia-gravity wave after one period
    converges at ~2nd order in space (amplitude 1e-3*H keeps the
    nonlinear residual far below the discretization error)."""
    # fixed physical domain 800 km; dt scales with dx (RK4: time error
    # negligible at these step counts)
    e16 = _igw_error(16, 50.0e3, 16)
    e32 = _igw_error(32, 25.0e3, 32)
    order = np.log2(e16 / e32)
    assert e16 < 0.08, f"coarse-grid wave error too large: {e16}"
    assert order > 1.7, f"IGW convergence order {order:.2f} < 1.7 " \
        f"(e16={e16:.3e}, e32={e32:.3e})"


# ----------------------------------------------------------------------
# 2. Williamson 2: steady geostrophic solid-body flow on the sphere

W2_U0 = 2 * np.pi * 6.37122e6 / (12.0 * 86400.0)   # one revolution / 12 days
W2_GH0 = 2.94e4


def _w2_fields(mesh):
    """Exact steady h and edge-normal velocity (alpha = 0)."""
    a = mesh.sphere_radius
    om = 7.29212e-5
    latc = np.asarray(mesh.lat_cell)
    late = np.asarray(mesh.lat_edge)
    ang = np.asarray(mesh.angle_edge)
    gh = W2_GH0 - (a * om * W2_U0 + 0.5 * W2_U0 ** 2) * np.sin(latc) ** 2
    un = W2_U0 * np.cos(late) * np.cos(ang)
    return gh / GRAV, un


def _w2_error(n, dt, hours):
    mesh = spherical_icos_mesh(n, bottom_depth=float(W2_GH0 / GRAV))
    cfg = ModelConfig(
        nvertlayers=1, ntracers=0, gravity=GRAV,
        tendencies=TendencyConfig(
            velocity_diffusion=False, velocity_hyperdiff=False,
            tracer_horz_adv=False, tracer_diffusion=False,
            tracer_hyperdiff=False))
    h0, un0 = _w2_fields(mesh)
    state = ModelState(h=jnp.asarray(h0)[:, None],
                       u=jnp.asarray(un0)[:, None],
                       tracers=jnp.zeros((0, mesh.ncells, 1)))
    nsteps = int(round(hours * 3600.0 / dt))
    out = jax.block_until_ready(
        jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, dt, nsteps,
                                    stepper=rk4_step))(state))
    area = np.asarray(mesh.area_cell)
    dev = np.asarray(out.h)[:, 0] - h0
    ref = h0 - h0.mean()
    return np.sqrt(np.sum(area * dev ** 2) / np.sum(area * ref ** 2))


def test_williamson2_steady_state_convergence():
    """Williamson test case 2: the balanced zonal flow must stay steady;
    the L2(h) drift over 24 h converges at ~2nd order with resolution."""
    e8 = _w2_error(8, 600.0, 24.0)
    e16 = _w2_error(16, 300.0, 24.0)
    order = np.log2(e8 / e16)
    assert e8 < 0.01, f"W2 drift too large on icos8: {e8}"
    assert order > 1.5, f"W2 convergence order {order:.2f} < 1.5 " \
        f"(e8={e8:.2e}, e16={e16:.2e})"


# ----------------------------------------------------------------------
# 3. cosine-bell tracer in the balanced flow (Williamson-1 flavored)

def test_cosine_bell_advection():
    """A cosine bell advected by the balanced solid-body flow for 12 h:
    the FCT tracer tracks the analytically rotated bell, conserves mass
    exactly, and respects the initial min/max bounds."""
    n = 16
    mesh = spherical_icos_mesh(n, bottom_depth=float(W2_GH0 / GRAV))
    cfg = ModelConfig(
        nvertlayers=1, ntracers=1, gravity=GRAV,
        flux_tracer_type="fct",
        tendencies=TendencyConfig(
            velocity_diffusion=False, velocity_hyperdiff=False,
            tracer_diffusion=False, tracer_hyperdiff=False))
    h0, un0 = _w2_fields(mesh)

    latc = np.asarray(mesh.lat_cell)
    lonc = np.asarray(mesh.lon_cell)
    a = mesh.sphere_radius
    rbell = a / 3.0

    def bell(lon_center):
        # great-circle distance from (lon_center, 0)
        r = a * np.arccos(np.clip(
            np.cos(latc) * np.cos(lonc - lon_center), -1.0, 1.0))
        return np.where(r < rbell,
                        0.5 * (1.0 + np.cos(np.pi * r / rbell)), 0.0)

    tr0 = bell(np.pi / 2)
    state = ModelState(h=jnp.asarray(h0)[:, None],
                       u=jnp.asarray(un0)[:, None],
                       tracers=jnp.asarray(tr0)[None, :, None])

    hours = 12.0
    dt = 300.0
    nsteps = int(round(hours * 3600.0 / dt))
    out = jax.block_until_ready(
        jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, dt, nsteps))(state))

    # exact: bell rotated east by (u0/a) * t
    tr_exact = bell(np.pi / 2 + W2_U0 / a * hours * 3600.0)
    tr1 = np.asarray(out.tracers)[0, :, 0]
    area = np.asarray(mesh.area_cell)

    # mass conservation (thickness-weighted) to machine precision
    m0 = np.sum(area * np.asarray(state.h)[:, 0] * tr0)
    m1 = np.sum(area * np.asarray(out.h)[:, 0] * tr1)
    assert abs(m1 - m0) / m0 < 1e-12

    # FCT monotonicity: no new extrema beyond roundoff
    assert tr1.min() > -1e-10
    assert tr1.max() < tr0.max() + 1e-10

    # tracks the rotated bell (coarse mesh: generous but meaningful gate;
    # the error is dominated by shape erosion of the ~6-cell-wide bell)
    l2 = np.sqrt(np.sum(area * (tr1 - tr_exact) ** 2)
                 / np.sum(area * tr_exact ** 2))
    assert l2 < 0.35, f"cosine-bell L2 error {l2:.3f}"
    # the bell's peak stays near the exact center (phase speed check)
    i_peak = np.argmax(tr1)
    lon_err = (lonc[i_peak] - (np.pi / 2 + W2_U0 / a * hours * 3600.0)
               + np.pi) % (2 * np.pi) - np.pi
    dx = np.sqrt(4 * np.pi * a * a / mesh.ncells)
    assert abs(lon_err) * a * np.cos(latc[i_peak]) < 2.5 * dx
