"""Patch-structured icosahedral sphere path (mesh/icos_patches.py,
ops/patch_stencil.py): exact agreement with the general gather path.

The patch mesh is the SAME ocean as the generator mesh (permuted ids
with a few dead seam slots), and every stencil's fix-up recipe IS the
gather recipe — so patch-on vs patch-off must agree to float summation
order on every row, which is what these tests pin. Reference analogue:
HorzOperatorsTest.cpp exercises the operators on one decomposition;
here the second execution path plays the role of the oracle."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh.icos_patches import _REGISTRY, patch_icos_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.ops import trisk
from omega_tpu.stepping import rk4_step, run_steps


@pytest.fixture(scope="module")
def pmesh():
    n = 8
    return patch_icos_mesh(spherical_icos_mesh(n), n)


class _gather_path:
    """Force the general gather path (patches off) inside the block."""

    def __enter__(self):
        os.environ["OMEGA_PATCHES"] = "0"

    def __exit__(self, *exc):
        del os.environ["OMEGA_PATCHES"]


def test_mesh_accounting(pmesh):
    n = 8
    info = _REGISTRY[pmesh.patch_key]
    assert info.ngrid == 10 * n * n
    assert pmesh.ncells == 10 * n * n + 2
    # dead ids (holes) == appended orphans for edges and vertices
    assert pmesh.nedges - 3 * info.ngrid == pmesh.nedges - 30 * n * n + \
        (3 * info.ngrid - 30 * n * n)
    # real (non-dead) elements match the generator counts
    em = np.asarray(pmesh.edge_mask)
    assert int((em > 0).sum()) == 30 * n * n  # all real edges interior
    # cell-destination stencils fix up only pentagons + poles: O(1)
    assert len(info.tables["div"].fix_ids) <= 30
    assert len(info.tables["kite"].fix_ids) <= 30 * n  # O(n) seams
    for t in info.tables.values():
        assert len(t.entries) <= 33


def test_all_operators_match_gather(pmesh):
    mesh = pmesh
    rng = np.random.default_rng(3)
    K = 4
    fc = jnp.asarray(rng.standard_normal((mesh.ncells, K)))
    fe = jnp.asarray(rng.standard_normal((mesh.nedges, K)))
    fv = jnp.asarray(rng.standard_normal((mesh.nvertices, K)))
    ops = {
        "div": lambda: trisk.div_cell(mesh, fe),
        "curl": lambda: trisk.curl_vertex(mesh, fe),
        "tang": lambda: trisk.tangential_edge(mesh, fe),
        "grad": lambda: trisk.grad_edge(mesh, fc),
        "ke": lambda: trisk.ke_cell(mesh, fe),
        "kite": lambda: trisk.cell_to_vertex_kite(mesh, fc),
        "cmean": lambda: trisk.cell_mean_on_edge(mesh, fc),
        "cdiff": lambda: trisk.cell_diff_on_edge(mesh, fc),
        "vmean": lambda: trisk.vertex_mean_on_edge(mesh, fv),
        "vdiff": lambda: trisk.vertex_diff_on_edge(mesh, fv),
        "signed": lambda: trisk.edge_to_cell_signed(mesh, fe),
        "divpos": lambda: trisk.div_cell_pos(mesh, fe),
        "divneg": lambda: trisk.div_cell_neg(mesh, fe),
        "cpair0": lambda: trisk.cell_pair_on_edge(mesh, fc)[0],
        "vpair1": lambda: trisk.vertex_pair_on_edge(mesh, fv)[1],
        "iso": lambda: trisk.interp_cell_to_edge_iso(mesh, fc),
    }
    for name, fn in ops.items():
        on = fn()
        with _gather_path():
            off = fn()
        err = float(jnp.max(jnp.abs(on - off))
                    / (jnp.max(jnp.abs(off)) + 1e-300))
        assert err < 1e-13, (name, err)


def test_batched_leading_dims(pmesh):
    rng = np.random.default_rng(5)
    fe = jnp.asarray(rng.standard_normal((3, pmesh.nedges, 4)))
    on = trisk.div_cell(pmesh, fe)
    with _gather_path():
        off = trisk.div_cell(pmesh, fe)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off),
                               rtol=0, atol=1e-13)


def _initial_state(mesh, K, ntracers=2):
    ssh = np.sin(2 * np.asarray(mesh.lat_cell)) \
        * np.cos(np.asarray(mesh.lon_cell))
    depth0 = float(np.asarray(mesh.bottom_depth)[0])
    h = jnp.asarray((depth0 + 100.0 * ssh[:, None]) / K) * jnp.ones((1, K))
    return ModelState(
        h=h, u=jnp.zeros((mesh.nedges, K)),
        tracers=10.0 + jnp.zeros((ntracers, mesh.ncells, K)))


@pytest.mark.parametrize("stepper", [None, rk4_step],
                         ids=["fb", "rk4"])
def test_steps_match_gather(pmesh, stepper):
    K = 5
    cfg = ModelConfig(nvertlayers=K, ntracers=2,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K)
    kw = {} if stepper is None else {"stepper": stepper}
    on = run_steps(pmesh, cfg, state, 0.0, 60.0, 8, **kw)
    with _gather_path():
        off = run_steps(pmesh, cfg, state, 0.0, 60.0, 8, **kw)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(on, fld)), np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld
        assert np.all(np.isfinite(a)), fld


def test_conservation_and_dead_rows(pmesh):
    K = 4
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, 1)
    out = run_steps(pmesh, cfg, state, 0.0, 60.0, 12)
    area = np.asarray(pmesh.area_cell)[:, None]
    v0 = float(np.sum(np.asarray(state.h) * area))
    v1 = float(np.sum(np.asarray(out.h) * area))
    assert abs(v1 - v0) / v0 < 1e-13
    # dead (masked) edges never acquire velocity: every tendency term
    # is edge_mask-gated, so u stays identically zero there
    dead = np.asarray(pmesh.edge_mask) == 0.0
    assert dead.any()
    assert np.all(np.asarray(out.u)[dead] == 0.0)


@pytest.mark.parametrize("knobs", [{},
                                   {"OMEGA_PATCH_LANETRIM": "1",
                                    "OMEGA_PATCH_WSLICE": "1"}],
                         ids=["default", "lanetrim-wslice"])
def test_patch_megastep_matches_composed(pmesh, monkeypatch, knobs):
    """The whole-step sphere kernel (ops/patch_megastep.py, interpret
    mode on CPU) equals the composed FB stepper to rounding, including
    the pole rows recomputed on the fix submesh, and conserves volume
    exactly.  Parametrized over the kernel layout knobs (per-class lane
    trim, lane-slice weight reads) so the optional DMA/read paths stay
    pinned to the same oracle."""
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    for k, v in knobs.items():
        monkeypatch.setenv(k, v)
    K = 3
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    assert patch_megastep.supported(pmesh, cfg)
    state = _initial_state(pmesh, K, 1)
    # give u structure so the velocity chain is exercised
    rng = np.random.default_rng(7)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = ModelState(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)

    monkeypatch.setenv("OMEGA_PATCH_MEGA", "1")
    on = run_steps(pmesh, cfg, state, 0.0, 60.0, 2)
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "0")
    off = run_steps(pmesh, cfg, state, 0.0, 60.0, 2)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(on, fld)), np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld
    area = np.asarray(pmesh.area_cell)[:, None]
    v0 = float(np.sum(np.asarray(state.h) * area))
    v1 = float(np.sum(np.asarray(on.h) * area))
    assert abs(v1 - v0) / v0 < 1e-13


@pytest.mark.parametrize("flux", ["center", "upwind"])
def test_rk2_patch_megastep_matches_composed(pmesh, flux):
    """The two-stage RK2 patch kernel pair (ops/patch_megastep.
    rk2_patch_megastep_framed: stage A emits the midpoint, an in-frame
    refresh re-establishes the margins, stage B reads (mid, orig)
    channel blocks) equals the composed rk2_step to rounding, with the
    pole rows advanced on the wider rk2 fix submesh.  The upwind
    parametrization pins the regression where _pre_ops' thickness picks
    were named h0/h1 and silently shadowed the stage chains'
    original-state block (4% h error before the hp0/hp1 rename)."""
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import rk2_step

    K, L = 3, 2
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      flux_thickness_type=flux, flux_tracer_type=flux,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, L)
    rng = np.random.default_rng(13)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = MS(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)
    dt, nsteps = 60.0, 3

    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    ref, t = state, 0.0
    for _ in range(nsteps):
        carry = patch_megastep.rk2_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=L, interpret=True)
        ref = rk2_step(pmesh, cfg, ref, t, dt)
        t += dt
    out = patch_megastep.unstack_frames(pmesh, carry, K, L, MS)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld
    area = np.asarray(pmesh.area_cell)[:, None]
    v0 = float(np.sum(np.asarray(state.h) * area))
    v1 = float(np.sum(np.asarray(out.h) * area))
    assert abs(v1 - v0) / v0 < 1e-13


def test_rk4_patch_megastep_matches_composed(pmesh):
    """The four-stage RK4 patch kernel sequence (ops/patch_megastep.
    rk4_patch_megastep_framed: each stage kernel emits the next
    provisional + accumulator channel blocks, refreshed in-frame between
    stages) equals the composed rk4_step to rounding."""
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import rk4_step

    K, L = 3, 1
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, L)
    rng = np.random.default_rng(17)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = MS(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)
    dt, nsteps = 60.0, 2

    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    ref, t = state, 0.0
    for _ in range(nsteps):
        carry = patch_megastep.rk4_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=L, interpret=True)
        ref = rk4_step(pmesh, cfg, ref, t, dt)
        t += dt
    out = patch_megastep.unstack_frames(pmesh, carry, K, L, MS)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld


def test_patch_megastep_physics_wind_drag_vmix(pmesh, monkeypatch):
    """The Omega-1 science configuration on the SPHERE kernel (round 4):
    wind forcing, quadratic bottom drag and constant-coefficient
    implicit vertical mixing run inside the patch chain (wind planes in
    reserved const lanes, lane-axis PCR after the horizontal chain) and
    match the composed FB stepper to rounding, pole-fix rows included."""
    from omega_tpu.core import VertMixConfig
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    K, L = 4, 1
    cfg = ModelConfig(
        nvertlayers=K, ntracers=L,
        vert_mix=VertMixConfig(enabled=True, kappa_tracer=1e-3,
                               kappa_momentum=1e-2),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    assert patch_megastep.supported(pmesh, cfg)
    state = _initial_state(pmesh, K, L)
    rng = np.random.default_rng(31)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = MS(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)
    wind = (jnp.asarray(0.1 * np.cos(np.asarray(pmesh.lat_cell))),
            jnp.asarray(0.05 * np.sin(np.asarray(pmesh.lat_cell))))
    dt, nsteps = 60.0, 2

    # framed carry (the run_steps fast path's building block)
    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    pw = patch_megastep.make_wind(pmesh, cfg, wind, state.h.dtype)
    ref, t = state, 0.0
    for _ in range(nsteps):
        carry = patch_megastep.fb_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=L, interpret=True, wind=pw)
        ref = forward_backward_step(pmesh, cfg, ref, t, dt,
                                    wind_stress=wind)
        t += dt
    out = patch_megastep.unstack_frames(pmesh, carry, K, L, MS)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld
        assert np.all(np.isfinite(a)), fld


def test_rk2_patch_megastep_physics(pmesh):
    """RK2 patch stage kernels with wind/drag/vmix vs composed rk2_step
    (vmix applies once, at the end of the full step)."""
    from omega_tpu.core import VertMixConfig
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import rk2_step

    K, L = 3, 1
    cfg = ModelConfig(
        nvertlayers=K, ntracers=L,
        vert_mix=VertMixConfig(enabled=True, kappa_tracer=1e-3,
                               kappa_momentum=1e-2),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    state = _initial_state(pmesh, K, L)
    rng = np.random.default_rng(37)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = MS(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)
    wind = (jnp.asarray(0.1 * np.cos(np.asarray(pmesh.lat_cell))),
            jnp.asarray(0.05 * np.ones(pmesh.ncells)))
    dt, nsteps = 60.0, 2

    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    pw = patch_megastep.make_wind(pmesh, cfg, wind, state.h.dtype)
    ref, t = state, 0.0
    for _ in range(nsteps):
        carry = patch_megastep.rk2_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=L, interpret=True, wind=pw)
        ref = rk2_step(pmesh, cfg, ref, t, dt, wind_stress=wind)
        t += dt
    out = patch_megastep.unstack_frames(pmesh, carry, K, L, MS)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld


def test_patch_megastep_framed_carry(pmesh, monkeypatch):
    """The persistent-frame scan carry (stack_frames -> N framed steps
    -> unstack_frames) equals both the per-step kernel API and the
    composed stepper: the in-frame halo refresh, pole fix_vals carry,
    and hole re-zeroing reproduce the full re-assembly each step."""
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    K = 3
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, 1)
    rng = np.random.default_rng(11)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = MS(h=state.h, u=jnp.asarray(u0), tracers=state.tracers)
    dt, nsteps = 60.0, 3

    # framed carry
    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    t = 0.0
    for _ in range(nsteps):
        carry = patch_megastep.fb_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=1)
        t += dt
    framed = patch_megastep.unstack_frames(pmesh, carry, K, 1, MS)

    # per-step kernel API
    st, t = state, 0.0
    for _ in range(nsteps):
        st = patch_megastep.fb_patch_megastep(pmesh, cfg, st, t, dt)
        t += dt

    for fld in ("h", "u", "tracers"):
        a = np.asarray(getattr(framed, fld))
        b = np.asarray(getattr(st, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-13, fld


def test_patch_megastep_upwind_matches_composed(pmesh, monkeypatch):
    """Upwind thickness/tracer fluxes fused on the SPHERE chain: the
    c0/c1 pair tables have the same source availability as cmean, so
    the center validity masks cover them exactly; result matches the
    composed upwind stepper to rounding, poles included."""
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    K, L = 3, 1
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      flux_thickness_type="upwind",
                      flux_tracer_type="upwind",
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    assert patch_megastep.supported(pmesh, cfg)
    state = _initial_state(pmesh, K, L)
    rng = np.random.default_rng(53)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = ModelState(h=state.h, u=jnp.asarray(u0),
                       tracers=state.tracers)

    monkeypatch.setenv("OMEGA_PATCH_MEGA", "1")
    on = state
    for i in range(2):
        on = patch_megastep.fb_patch_megastep(pmesh, cfg, on, i * 60.0,
                                              60.0, interpret=True)
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "0")
    monkeypatch.setenv("OMEGA_PATCHES", "0")
    off = state
    for i in range(2):
        off = forward_backward_step(pmesh, cfg, off, i * 60.0, 60.0)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(on, fld)), np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld


def test_patch_megastep_pp81_matches_composed(pmesh, monkeypatch):
    """PP81 vertical mixing fused on the SPHERE chain: the coefficient
    fields run as chain ops (lane diffs + two cmean + one ke sweep over
    the updated state, radius-7 budget), feeding per-lane G arrays to
    the lane-axis PCR — exact vs the composed stepper's _mix, poles
    included."""
    from omega_tpu.core import VertMixConfig
    from omega_tpu.core.state import ModelState as MS
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    K, L = 4, 2
    cfg = ModelConfig(
        nvertlayers=K, ntracers=L,
        vert_mix=VertMixConfig(enabled=True, scheme="pp81",
                               nu0=1e-2, alpha=5.0, n_exp=2,
                               temp_index=0, salt_index=1),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9))
    # VMEM-gated on hardware (see supported()); correctness runs opt in
    assert not patch_megastep.supported(pmesh, cfg)
    monkeypatch.setenv("OMEGA_PATCH_PP81", "1")
    assert patch_megastep.supported(pmesh, cfg)
    rng = np.random.default_rng(61)
    d0 = float(np.asarray(pmesh.bottom_depth)[0])
    sshp = np.sin(2 * np.asarray(pmesh.lat_cell))
    h = jnp.asarray((d0 + 100.0 * sshp[:, None]) / K) * jnp.ones((1, K))
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K)) \
        * np.asarray(pmesh.edge_mask)[:, None]
    T = 10.0 + 2.0 * np.arange(K)[::-1] / K \
        + 0.1 * rng.standard_normal((pmesh.ncells, K))
    S = 35.0 + 0.1 * rng.standard_normal((pmesh.ncells, K))
    state = MS(h=h, u=jnp.asarray(u0),
               tracers=jnp.asarray(np.stack([T, S])))
    dt, nsteps = 60.0, 2

    carry = patch_megastep.stack_frames(pmesh, cfg, state)
    ref, t = state, 0.0
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "0")
    monkeypatch.setenv("OMEGA_PATCHES", "1")
    for _ in range(nsteps):
        carry = patch_megastep.fb_patch_megastep_framed(
            pmesh, cfg, carry, t, dt, K=K, L=L, interpret=True)
        ref = forward_backward_step(pmesh, cfg, ref, t, dt)
        t += dt
    out = patch_megastep.unstack_frames(pmesh, carry, K, L, MS)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-11, fld
        assert np.all(np.isfinite(a)), fld


def test_patch_megastep_pool_mode_exact(pmesh, monkeypatch):
    """OMEGA_PATCH_POOL=1 (explicit cross-op VMEM buffer reuse) is
    bit-identical to the default path at equal evaluation extents
    (yshrink off), and matches the composed stepper to rounding."""
    from omega_tpu.ops import patch_megastep
    from omega_tpu.stepping.steppers import forward_backward_step

    K = 3
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, 1)
    rng = np.random.default_rng(9)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = ModelState(h=state.h, u=jnp.asarray(u0),
                       tracers=state.tracers)

    monkeypatch.setenv("OMEGA_PATCH_YSHRINK", "0")
    monkeypatch.setenv("OMEGA_PATCH_POOL", "1")
    on = patch_megastep.fb_patch_megastep(pmesh, cfg, state, 0.0, 60.0,
                                          interpret=True)
    monkeypatch.setenv("OMEGA_PATCH_POOL", "0")
    off = patch_megastep.fb_patch_megastep(pmesh, cfg, state, 0.0, 60.0,
                                           interpret=True)
    # parking values in the pool blocks FMA contraction across the
    # store boundary, so agreement is to rounding (1 ulp), not bitwise
    for fld in ("h", "u", "tracers"):
        a = np.asarray(getattr(on, fld))
        b = np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-14, fld

    ref = forward_backward_step(pmesh, cfg, state, 0.0, 60.0)
    for fld in ("h", "u", "tracers"):
        a = np.asarray(getattr(on, fld))
        b = np.asarray(getattr(ref, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-12, fld


@pytest.mark.parametrize("vmix", [False, True], ids=["inviscid", "pp81"])
def test_fb2_staged_patch_megastep_matches_single(pmesh, monkeypatch,
                                                  vmix):
    """OMEGA_PATCH_FB2=1 (staged two-kernel FB: thickness+tracers ->
    h_new refresh -> velocity, with the implicit-vmix tail in stage B)
    matches the single-kernel framed FB / the composed stepper to
    rounding — the chains are fb_chain split at an op boundary, so only
    fusion-order rounding may differ.  The PP81 case is the un-gating
    path for sphere state-dependent mixing (its scoped-VMEM cost moves
    into a half-size kernel body)."""
    from omega_tpu.core.config import VertMixConfig
    K = 3
    vm = (VertMixConfig(enabled=True, scheme="pp81", method="pcr",
                        kappa_tracer=1e-5, kappa_momentum=1e-5)
          if vmix else VertMixConfig())
    cfg = ModelConfig(nvertlayers=K, ntracers=1, vert_mix=vm,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, 1)
    rng = np.random.default_rng(23)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = ModelState(h=state.h, u=jnp.asarray(u0),
                       tracers=state.tracers)
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "1")
    monkeypatch.setenv("OMEGA_PATCH_FB2", "1")
    on = run_steps(pmesh, cfg, state, 0.0, 60.0, 2)
    monkeypatch.delenv("OMEGA_PATCH_FB2")
    off = run_steps(pmesh, cfg, state, 0.0, 60.0, 2)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(on, fld)), np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-13, fld
        assert np.all(np.isfinite(a)), fld


@pytest.mark.parametrize("h_flux", ["center", "upwind"])
def test_fct_patch_megastep_matches_composed(pmesh, monkeypatch, h_flux):
    """The two-stage fused Zalesak FCT driver (ops/patch_megastep.
    fct_patch_megastep_framed: stage A emits h_new/u_new + the
    provisional and diffusion-accumulated tracer fields, an in-frame
    refresh on the FCT persist maps re-establishes the margins, stage B
    runs the limiter) equals the composed FB stepper with
    FluxTracerType 'fct' to rounding, and its tracers obey the Zalesak
    monotonicity contract.  Parametrized over the thickness flux (the
    FCT mass flux must follow it for compatibility)."""
    from omega_tpu.ops import patch_megastep

    K = 3
    cfg = ModelConfig(nvertlayers=K, ntracers=2, flux_tracer_type="fct",
                      flux_thickness_type=h_flux,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    assert patch_megastep.supported(pmesh, cfg, framed=True)
    assert not patch_megastep.supported(pmesh, cfg)   # one-shot: composed
    state = _initial_state(pmesh, K, 2)
    rng = np.random.default_rng(11)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    tr0 = jnp.asarray(rng.uniform(0.0, 1.0, (2, pmesh.ncells, K)))
    state = ModelState(h=state.h, u=jnp.asarray(u0), tracers=tr0)

    monkeypatch.setenv("OMEGA_PATCH_MEGA", "1")
    on = run_steps(pmesh, cfg, state, 0.0, 60.0, 3)
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "0")
    off = run_steps(pmesh, cfg, state, 0.0, 60.0, 3)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(on, fld)), np.asarray(getattr(off, fld))
        scale = np.max(np.abs(b)) + 1e-300
        assert np.max(np.abs(a - b)) / scale < 1e-11, fld
        assert np.all(np.isfinite(a)), fld
    # volume conservation + the monotone-advection contract (diffusion
    # at these coefficients stays inside rounding of the bounds)
    area = np.asarray(pmesh.area_cell)[:, None]
    v0 = float(np.sum(np.asarray(state.h) * area))
    v1 = float(np.sum(np.asarray(on.h) * area))
    assert abs(v1 - v0) / v0 < 1e-13
    assert np.asarray(on.tracers).min() >= -1e-9
    assert np.asarray(on.tracers).max() <= 1.0 + 1e-9


def test_attach_planes_operand_path_bitexact(pmesh, monkeypatch):
    """attach_planes moves the kernel's lane-major weight-plane stack
    onto the mesh pytree so it rides the jit boundary as a runtime
    OPERAND instead of a program constant (164 MB at icos48, ~530 MB at
    icos96 — past the axon remote-compile body limit).  Same stack,
    same kernel: results must be BITWISE identical to the closed-over
    default, and a stale planes key must fall back to the constant."""
    from omega_tpu.ops import patch_megastep
    K = 3
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    state = _initial_state(pmesh, K, 1)
    rng = np.random.default_rng(31)
    u0 = 0.1 * rng.standard_normal((pmesh.nedges, K))
    u0 *= np.asarray(pmesh.edge_mask)[:, None]
    state = ModelState(h=state.h, u=jnp.asarray(u0),
                       tracers=state.tracers)
    monkeypatch.setenv("OMEGA_PATCH_MEGA", "1")
    dtype = state.h.dtype
    ref = jax.jit(lambda s: run_steps(pmesh, cfg, s, 0.0, 60.0, 2))(state)

    am = patch_megastep.attach_planes(pmesh, dtype)
    assert am.patch_planes is not None and am.patch_planes_key
    out = jax.jit(lambda s, m: run_steps(m, cfg, s, 0.0, 60.0, 2))(
        state, am)
    for fld in ("h", "u", "tracers"):
        a, b = np.asarray(getattr(out, fld)), np.asarray(getattr(ref, fld))
        assert np.array_equal(a, b), fld

    # stale key (env knobs changed since attach) -> constant fallback,
    # still bitwise identical
    import dataclasses
    stale = dataclasses.replace(am, patch_planes_key=("stale",))
    out2 = jax.jit(lambda s, m: run_steps(m, cfg, s, 0.0, 60.0, 2))(
        state, stale)
    assert np.array_equal(np.asarray(out2.h), np.asarray(ref.h))
