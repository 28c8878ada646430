"""The whole forward-backward step as ONE Pallas kernel (mega-step).

Measured on v5e at 256^2 x 100: the composed step is ~5.8x off the HBM
roofline and scales linearly in cells but flat in K<=128 — i.e. it is
bound by PADDED HBM traffic, and the ~27 stencil passes each pay
glue copies (wrap pads, lane pads, layout slices) plus intermediate
materialization between passes. This kernel reads h, u, tracers ONCE
per (by, bx) tile (with a radius-R halo ring), computes every auxiliary
variable and tendency term in VMEM, and writes h_new, u_new, tr_new
once — the minimal-traffic formulation of the step.

Mechanics:
  * state lives in ONE stacked (CH, ny, nx, K128) array (CH = 1 h
    channel + 3 edge-class u channels + L tracer channels); K sits on
    lanes padded to 128 once per run, not per step — `run_steps` keeps
    the stacked layout across its whole scan so a step is exactly one
    kernel launch with no host-side glue copies
  * the periodic wrap is NOT materialized: each tile's in-DMA is split
    into 9 rectangles (3 y-bands x 3 x-bands, halo bands wrapped with a
    mod-ny/mod-nx start offset), so the kernel reads the native array
  * inside the kernel every structured-table stencil becomes static
    shifted rolls of the tile slab (garbage creeps in from the slab
    edge by one ring per application; the owned center stays valid
    because the total chain radius < R)
  * the hex lattice's parity-staggered column shifts are a row-parity
    select, with the global row index reconstructed from the tile id
  * supported configuration = the flagship FB step (structured f-plane
    mesh with uniform geometry, center fluxes, stacked ssh, pv/ke/ssh
    del2/del4 + tracer adv/del2/del4) PLUS the Omega-1 science physics
    (wind forcing via a packed input channel, quadratic bottom drag,
    constant-coefficient implicit vmix as a lane-axis PCR — round 4);
    anything else falls back to the composed stepper (steppers.py)

Semantics identical to stepping.forward_backward_step on the supported
configuration; exactness tested in interpreter mode and on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omega_tpu.ops import structured

# slab halo ring; the longest FB chain is exactly 6 columns
# (cmean+div+kite+vmean = 4, then tang's +-2) and 5 rows.
# Measured on v5e at 256^2 x 100: (R=8, tile 16) 6.8 ms beats
# (R=6, tile 16) 7.3 and (R=6, tile 24) 7.4; tile 32 OOMed the
# default 16MB scoped VMEM (the scope is 120MB now — see _call).
R = int(os.environ.get("OMEGA_MEGA_R", 8))
# RK2 runs TWO tendency chains back to back (radius 2x6 = 12), so it
# needs a wider ring; redundancy (by+2R)^2/by^2 says prefer tile 32.
R_RK2 = int(os.environ.get("OMEGA_MEGA_R_RK2", 12))


def _ring(kind, extra=0):
    """`extra` widens the ring for chain extensions (the implicit-vmix
    edge-thickness cmean adds one radius at the chain end; FB/RK4 stages
    absorb it in the R=8 slack but RK2's back-to-back chains do not)."""
    base = R_RK2 if kind == "rk2" else R
    if kind == "rk2" and extra:
        return base + extra
    return base


def parity_enabled() -> bool:
    """Parity-split layout: rows deinterleave into even/odd planes so
    the hex stagger's per-row column-shift select disappears — every
    stencil entry is ONE static roll per destination plane instead of
    two rolls + a parity `where` (see _apply). Row radii halve too, so
    the slab halo ring is (R//2, R) and read amplification drops.

    Default ON since the round-3 hardware A/B: FB 5.12 ms vs 5.5,
    RK2 9.92 vs 11.46 at 256^2 x 100 x 2 on v5e."""
    return os.environ.get("OMEGA_MEGA_PARITY", "1") in ("1", "true")


def _rings(kind, parity, extra=0):
    r = _ring(kind, extra)
    return ((r + 1) // 2, r) if parity else (r, r)


def enabled() -> bool:
    v = os.environ.get("OMEGA_MEGA_STEP")
    if v is not None:
        return v in ("1", "true")
    import jax as _j
    return _j.default_backend() == "tpu"


def _table(mesh, name):
    key = (mesh.structured_nx, mesh.structured_ny, mesh.structured_dc, name)
    tab = structured._TABLE_CACHE.get(key, (None,))[0]
    return None if tab is None else tuple(tab)


def _vmix_on(cfg) -> bool:
    """Implicit vertical mixing runs IN-KERNEL as a PCR along lanes
    after the horizontal chain (base/TriDiagSolvers.h PCRDiffusionSolver
    semantics) — both the constant-coefficient scheme and the PP81
    Richardson-number closure (whose coefficient fields are one more
    radius-1 sweep over the updated state). The Thomas method stays on
    the composed path."""
    vm = cfg.vert_mix
    return (vm.enabled and cfg.nvertlayers >= 2
            and vm.scheme in ("constant", "pp81") and vm.method == "pcr")


def supported(mesh, cfg, kind="fb", parity=None) -> bool:
    """The flagship configuration this kernel implements.

    Round 4: wind forcing, quadratic bottom drag (TendencyTerms.h:
    281-340) and constant-coefficient implicit vertical mixing run
    inside the kernels, so the Omega-1 science configuration stays on
    the fused fast path."""
    tc = cfg.tendencies
    if not structured.enabled(mesh):
        return False
    vm = cfg.vert_mix
    if vm.enabled and not _vmix_on(cfg):
        return False
    nx, ny = mesh.structured_nx, mesh.structured_ny
    if parity is None:
        parity = parity_enabled()
    by, bx = _pick_tile(ny // 2 if parity else ny, nx, kind,
                        vmix=_vmix_on(cfg))
    ry, rx = _rings(kind, parity, extra=1 if _vmix_on(cfg) else 0)
    # the 9-rectangle wrapped DMA needs each halo band contiguous mod n
    if by < ry or bx < rx:
        return False
    need = ("dc_edge", "dv_edge", "area_cell", "area_triangle", "f_vertex",
            "bottom_depth", "edge_mask", "mesh_scaling_del2",
            "mesh_scaling_del4")
    if any(structured.uniform_scalar(mesh, a) is None for a in need):
        return False
    if structured.uniform_scalar(mesh, "edge_mask") != 1.0:
        return False
    names = ("div", "ke", "curl", "kite", "tang", "cdiff", "cmean",
             "vdiff", "vmean", "signed_div")
    if any(_table(mesh, n) is None for n in names):
        return False
    # FCT (Zalesak) tracer fluxes fuse on the FB kernel only: the
    # limiter needs the thickness-first update order (core/tendencies
    # raises for RK paths too) and the relu'd div + cell-neighbor tables
    tracer_types = ("center", "upwind") + (("fct",) if kind == "fb"
                                           else ())
    if cfg.flux_tracer_type == "fct":
        fct_names = ("div_pos", "div_neg", "c0", "c1") + tuple(
            f"coc{j}" for j in range(6))
        if any(_table(mesh, n) is None for n in fct_names):
            return False
    return (cfg.flux_thickness_type in ("center", "upwind")
            and cfg.flux_tracer_type in tracer_types
            and cfg.ssh_formulation == "stacked"
            and tc.thickness_flux_div and tc.pv_advection and tc.ke_gradient
            and tc.ssh_gradient and tc.velocity_diffusion
            and tc.velocity_hyperdiff and tc.tracer_horz_adv
            and tc.tracer_diffusion and tc.tracer_hyperdiff
            and not tc.use_custom_tendency)


def _roll(s, d, axis):
    """Static-shift roll via slice+concat (out[i] = s[i + d])."""
    if d == 0:
        return s
    n = s.shape[axis]
    d = d % n
    lo = [slice(None)] * s.ndim
    hi = [slice(None)] * s.ndim
    lo[axis] = slice(d, None)
    hi[axis] = slice(0, d)
    return jnp.concatenate([s[tuple(lo)], s[tuple(hi)]], axis=axis)


def _apply(tab, val_list, even, pd):
    """Apply a structured shift table to per-channel slabs.

    val_list: list of ps arrays (Y, X, K). Returns list of pd arrays.
    out[t_dst][y, x] = sum w * val[t_src][y + dj, x + di(parity(y))].

    even=None selects the parity-split path: each value is a
    (2, Y2, X, K) stack of (even-rows, odd-rows) planes.  A destination
    plane p reads full row y = 2m+p+dj, i.e. source plane q=(p+dj)%2 at
    split row m+(p+dj-q)//2, with the column shift fixed to di_e (p=0)
    or di_o (p=1) — one static roll per plane, no `where`, and a dj=+-1
    entry shifts only ONE of the two planes.
    """
    if even is None:
        outs = [[None, None] for _ in range(pd)]
        for (t_dst, t_src, dj, di_e, di_o, w) in tab:
            s = val_list[t_src]
            for p, di in ((0, di_e), (1, di_o)):
                q = (p + dj) % 2
                a = _roll(_roll(s[q], (p + dj - q) // 2, 0), di, 1)
                o = outs[t_dst][p]
                outs[t_dst][p] = w * a if o is None else o + w * a
        return [jnp.stack(o) for o in outs]
    outs = [None] * pd
    for (t_dst, t_src, dj, di_e, di_o, w) in tab:
        s = val_list[t_src]
        s = _roll(s, dj, 0)
        a = _roll(s, di_e, 1)
        if di_e != di_o:
            b = _roll(s, di_o, 1)
            a = jnp.where(even, a, b)
        contrib = w * a
        outs[t_dst] = contrib if outs[t_dst] is None else outs[t_dst] + contrib
    return outs


# number of base (always-present) constants; physics extensions follow
# at fixed offsets and the split kernels append theirs after NCONST
# (14..18 = K, rho0, drag_coeff, kappa_tracer, kappa_momentum;
#  19 = None or the PP81 parameter tuple; 20/21 = upwind flags for the
#  thickness / tracer fluxes; 22 = FCT tracer flag, see _mega_args)
NCONST = 23


def _lane(x):
    return jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)


def _upwind_sel(u, a, b):
    """The reference's upwind selection (LayerThicknessAuxVars.h /
    TracerAuxVars.h): a where u > 0, b where u < 0, max(a, b) at rest —
    replicated expression-for-expression (aux.thickness_aux_edge)."""
    return jnp.where(u > 0, a, jnp.where(u < 0, b, jnp.maximum(a, b)))


def _h_fluxes(h, u, consts, ap):
    """(mean_h, flux_h) per edge channel for the configured
    FluxThicknessType: center (flux == mean) or upwind."""
    if consts[20]:
        h0 = ap("c0", [h], 3)
        h1 = ap("c1", [h], 3)
        mean_h = [0.5 * (h0[i] + h1[i]) for i in range(3)]
        flux_h = [_upwind_sel(u[i], h0[i], h1[i]) for i in range(3)]
        return mean_h, flux_h
    mean_h = ap("cmean", [h], 3)
    return mean_h, mean_h


def _htr_flux(h, tr_l, u, mean_h, consts, ap):
    """h*tracer on edges for the configured FluxTracerType
    (aux.tracer_aux): center -> cmean(h*tr); upwind -> the pair-product
    selection."""
    if consts[21]:
        h0 = ap("c0", [h], 3)
        h1 = ap("c1", [h], 3)
        t0 = ap("c0", [tr_l], 3)
        t1 = ap("c1", [tr_l], 3)
        return [_upwind_sel(u[i], h0[i] * t0[i], h1[i] * t1[i])
                for i in range(3)]
    return ap("cmean", [h * tr_l], 3)


def _fct_adv(h, h_new, trl, u, mass_flux, consts, ap):
    """Fused Zalesak FCT advective tendency — core/fct.
    fct_tracer_tendency replicated expression-for-expression on kernel
    slabs (edge_mask is uniformly 1 on the fused planar path, so the
    mask factors drop). mass_flux = flux_h * u per edge channel (the
    thickness equation's own flux, the FCT compatibility requirement)."""
    dt = consts[0]
    eps = 1e-30
    tr0 = ap("c0", [trl], 3)
    tr1 = ap("c1", [trl], 3)
    f_hi = [0.5 * (tr0[i] + tr1[i]) * mass_flux[i] for i in range(3)]
    f_lo = [jnp.where(u[i] > 0, tr0[i],
                      jnp.where(u[i] < 0, tr1[i],
                                0.5 * (tr0[i] + tr1[i]))) * mass_flux[i]
            for i in range(3)]
    div_lo = ap("div", f_lo, 1)[0]
    tr_td = (trl * h - dt * div_lo) / h_new

    # admissible bounds: extrema of the old and transported fields over
    # the cell + its 6 lattice neighbors (Zalesak eq. 17-18)
    tr_max, tr_min = trl, trl
    td_max, td_min = tr_td, tr_td
    for j in range(6):
        nb_o = ap(f"coc{j}", [trl], 1)[0]
        nb_t = ap(f"coc{j}", [tr_td], 1)[0]
        tr_max = jnp.maximum(tr_max, nb_o)
        tr_min = jnp.minimum(tr_min, nb_o)
        td_max = jnp.maximum(td_max, nb_t)
        td_min = jnp.minimum(td_min, nb_t)
    tr_max = jnp.maximum(tr_max, td_max)
    tr_min = jnp.minimum(tr_min, td_min)

    # antidiffusive fluxes, split so the relu'd budgets use the fixed
    # nonnegative div_pos/div_neg stencils (Zalesak eq. 7-10)
    a = [f_hi[i] - f_lo[i] for i in range(3)]
    b_pos = [jnp.maximum(a[i], 0.0) for i in range(3)]
    b_neg = [jnp.maximum(-a[i], 0.0) for i in range(3)]
    p_in = dt * (ap("div_neg", b_pos, 1)[0] + ap("div_pos", b_neg, 1)[0])
    p_out = dt * (ap("div_pos", b_pos, 1)[0] + ap("div_neg", b_neg, 1)[0])
    q_in = (tr_max - tr_td) * h_new
    q_out = (tr_td - tr_min) * h_new
    r_in = jnp.clip(q_in / jnp.maximum(p_in, eps), 0.0, 1.0)
    r_out = jnp.clip(q_out / jnp.maximum(p_out, eps), 0.0, 1.0)

    r_in0 = ap("c0", [r_in], 3)
    r_in1 = ap("c1", [r_in], 3)
    r_out0 = ap("c0", [r_out], 3)
    r_out1 = ap("c1", [r_out], 3)
    f_corr = [f_lo[i] + jnp.where(a[i] >= 0,
                                  jnp.minimum(r_in1[i], r_out0[i]),
                                  jnp.minimum(r_in0[i], r_out1[i]))
              * a[i] for i in range(3)]
    return -ap("div", f_corr, 1)[0]


def _wind_drag(du, u, mean_h, ke, wslab, consts, ap):
    """Wind forcing (top layer) and quadratic bottom drag (bottom layer)
    appended to the du accumulation, mirroring tendencies.velocity_
    tendency exactly (TendencyTerms.h:281-340; edge_mask == 1 on the
    supported mesh so the mask gates are free):

      du[k=0]   += stress_e / (rho0 * mean_h[e, 0])
      du[k=K-1] -= Cd * sqrt(ke0 + ke1) * u[e, K-1] / mean_h[e, K-1]

    ke0 + ke1 == 2 * cmean(ke) bit-exactly (0.5x halving and 2x doubling
    are exact; rounding commutes with power-of-two scaling)."""
    K, rho0, cd = consts[14], consts[15], consts[16]
    if wslab is not None:
        for i in range(3):
            w_i = wslab[..., i:i + 1]
            du[i] = du[i] + jnp.where(_lane(du[i]) == 0,
                                      w_i / (rho0 * mean_h[i]), 0.0)
    if cd:
        kee = ap("cmean", [ke], 3)
        for i in range(3):
            speed = jnp.sqrt(jnp.maximum(2.0 * kee[i], 0.0))
            du[i] = du[i] + jnp.where(
                _lane(du[i]) == K - 1,
                -(cd * speed * u[i] / mean_h[i]), 0.0)
    return du


def _shift_lane(x, offset, fill):
    """x[..., k + offset] along lanes, out-of-range -> fill (the tridiag
    PCR neighbor access, ops/tridiag._shift semantics)."""
    K = x.shape[-1]
    if offset == 0:
        return x
    pad_shape = x.shape[:-1] + (min(abs(offset), K),)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if offset >= K or offset <= -K:
        return jnp.full_like(x, fill)
    if offset > 0:
        return jnp.concatenate([x[..., offset:], pad], axis=-1)
    return jnp.concatenate([pad, x[..., :offset]], axis=-1)


def _pcr_diffusion(g, hmass, xs):
    """Parallel cyclic reduction for the diffusion-form system
    (H_k + G_k + G_{k-1}) x_k - G_{k-1} x_{k-1} - G_k x_{k+1} = b_k,
    log2(Kp) lane sweeps (ops/tridiag.pcr run along lanes; identical
    level count and out-of-range-row identity semantics, so results are
    bit-equal to the composed path's K-length solve).  Solves every b in
    `xs` against one matrix, sharing the alpha/beta factors."""
    import math
    a = -_shift_lane(g, -1, 0.0)
    c = -g
    bb = hmass + g + _shift_lane(g, -1, 0.0)
    Kp = g.shape[-1]
    levels = math.ceil(math.log2(Kp)) if Kp > 1 else 0
    s = 1
    xs = list(xs)
    for _ in range(levels):
        alpha = -a / _shift_lane(bb, -s, 1.0)
        beta = -c / _shift_lane(bb, +s, 1.0)
        a_new = alpha * _shift_lane(a, -s, 0.0)
        c_new = beta * _shift_lane(c, +s, 0.0)
        b_new = bb + alpha * _shift_lane(c, -s, 0.0) \
            + beta * _shift_lane(a, +s, 0.0)
        xs = [x + alpha * _shift_lane(x, -s, 0.0)
              + beta * _shift_lane(x, +s, 0.0) for x in xs]
        a, bb, c = a_new, b_new, c_new
        s *= 2
    return [x / bb for x in xs]


def _pp81_coeffs(h_new, un, trn, tabs, consts, even, L):
    """Richardson-number mixing coefficients on the slab, mirroring
    core/vmix.pp81_coefficients exactly (interface values live at lanes
    k < K-1; later masking ignores the rest). Returns
    (kappa_cell (.., K), nu_edge [3 x (.., K)])."""
    grav, K = consts[1], consts[14]
    (nu0, alpha, n_exp, a_t, b_s, ti, si, kt0, km0) = consts[19]
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)
    eps = 1.0e-16
    sh = lambda x: _shift_lane(x, +1, 1.0)

    du = [un[i] - _shift_lane(un[i], +1, 0.0) for i in range(3)]
    dz_e = 0.5 * (h_new + sh(h_new))
    if ti >= 0 and si >= 0:
        T, S = trn[ti], trn[si]
        db = grav * (a_t * (T - _shift_lane(T, +1, 0.0))
                     - b_s * (S - _shift_lane(S, +1, 0.0)))
        n2_cell = jnp.maximum(db / dz_e, 0.0)
    else:
        n2_cell = jnp.zeros_like(dz_e)

    dz_edge = ap("cmean", [dz_e], 3)
    ke_du = ap("ke", [d * d for d in du], 1)[0]
    shear2_cell = 2.0 * ke_du / (dz_e * dz_e)
    shear2_edge = [(du[i] / dz_edge[i]) ** 2 for i in range(3)]

    ri_cell = n2_cell / jnp.maximum(shear2_cell, eps)
    n2_edge = ap("cmean", [n2_cell], 3)
    ri_edge = [n2_edge[i] / jnp.maximum(shear2_edge[i], eps)
               for i in range(3)]

    def coeffs(ri):
        f = 1.0 + alpha * jnp.maximum(ri, 0.0)
        nu = nu0 / f ** n_exp
        return nu / f + kt0, nu + km0

    kappa_cell, _ = coeffs(ri_cell)
    nu_edge = [coeffs(ri_edge[i])[1] for i in range(3)]
    return kappa_cell, nu_edge


def _vmix_apply(h_new, un, trn, tabs, consts, even, L):
    """Operator-split backward-Euler vertical mixing on the updated
    state (steppers._mix / core/vmix.implicit_vmix): tracers against the
    cell-thickness matrix, velocity against the edge-thickness (cmean of
    h_new) matrices; coefficients constant or PP81 (consts[19]). Dead
    lanes (k >= K) carry H=1/G=0 identity rows, matching the composed
    solve's out-of-range fills bit-exactly."""
    kt, km = consts[17], consts[18]
    if kt is None:
        return un, trn
    dt, K = consts[0], consts[14]
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)
    if consts[19] is not None:
        kt, km_e = _pp81_coeffs(h_new, un, trn, tabs, consts, even, L)
    else:
        km_e = [km] * 3

    def gcoef(h, kappa):
        dz = 0.5 * (h + _shift_lane(h, +1, 1.0))
        g = dt * kappa / dz
        return jnp.where(_lane(h) < K - 1, g, 0.0)

    def hmass(h):
        return jnp.where(_lane(h) < K, h, 1.0)

    lm = _lane(h_new) < K
    g_c = gcoef(h_new, kt)
    trn = _pcr_diffusion(g_c, hmass(h_new),
                         [jnp.where(lm, h_new * trn[l], 0.0)
                          for l in range(L)])
    he = ap("cmean", [h_new], 3)
    un_out = []
    for i in range(3):
        (ui,) = _pcr_diffusion(gcoef(he[i], km_e[i]), hmass(he[i]),
                               [jnp.where(lm, he[i] * un[i], 0.0)])
        un_out.append(ui)
    return un_out, trn


def _fb_compute(h, u, tr, even, tabs, consts, L, wslab=None):
    """The FB step chain on one VMEM slab (valid on the center; garbage
    creeps in from the slab edge by the chain radius).

    h: (Y, X, K); u, tr: lists of (Y, X, K). Returns (h_new, un, trn).
    """
    (dt, grav, nu2, nu4, div_factor, ed2, ed4, inv_dc, inv_dv, inv_dv_floor,
     geo, f0v, scal2, scal4) = consts[:14]

    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)

    # --- thickness (center or upwind flux)
    mean_h, flux_h = _h_fluxes(h, u, consts, ap)
    flux = [flux_h[i] * u[i] for i in range(3)]
    dh = ap("div", flux, 1)[0]
    h_new = h + dt * (-dh)

    # --- tracers (center/upwind flux + del2 + del4; FCT replaces the
    # advective term with the fused Zalesak limiter)
    trn = []
    for l in range(L):
        if len(consts) > 22 and consts[22]:
            adv = _fct_adv(h, h_new, tr[l], u, flux, consts, ap)
        else:
            htr = _htr_flux(h, tr[l], u, mean_h, consts, ap)
            adv = -ap("div", [htr[i] * u[i] for i in range(3)], 1)[0]
        ctr = ap("cdiff", [tr[l]], 3)
        d2tr = ap("signed_div",
                  [geo * mean_h[i] * ctr[i] for i in range(3)],
                  1)[0]
        cd2 = ap("cdiff", [d2tr], 3)
        hyp = ap("signed_div", [geo * scal4 * cd2[i]
                                for i in range(3)], 1)[0]
        dtr = adv + ed2 * scal2 * d2tr - ed4 * hyp
        trn.append((tr[l] * h + dt * dtr) / h_new)

    # --- velocity aux (momentum aux on h_new, FB order)
    ke = ap("ke", [ui * ui for ui in u], 1)[0]
    div_u = ap("div", u, 1)[0]
    rvort = ap("curl", u, 2)
    h_v = ap("kite", [h_new], 2)
    nrv = [rvort[i] / h_v[i] for i in range(2)]
    npv = [f0v / h_v[i] for i in range(2)]
    nrv_e = ap("vmean", nrv, 3)
    npv_e = ap("vmean", npv, 3)
    q_e = [nrv_e[i] + npv_e[i] for i in range(3)]

    cdd = ap("cdiff", [div_u], 3)
    vdr = ap("vdiff", rvort, 3)
    del2_e = [cdd[i] * inv_dc - vdr[i] * inv_dv_floor
              for i in range(3)]
    del2_div = ap("div", del2_e, 1)[0]
    del2_rv = ap("curl", del2_e, 2)

    mean_hn, flux_hn = _h_fluxes(h_new, u, consts, ap)
    F = [flux_hn[i] * u[i] for i in range(3)]
    tf = ap("tang", F, 3)
    tfq = ap("tang", [F[i] * q_e[i] for i in range(3)], 3)
    pv = [0.5 * (q_e[i] * tf[i] + tfq[i]) for i in range(3)]

    gke = ap("cdiff", [ke], 3)
    gssh = ap("cdiff", [h_new], 3)       # stacked ssh, uniform depth
    cd4 = ap("cdiff", [del2_div], 3)
    vd4 = ap("vdiff", del2_rv, 3)

    # the du diff terms use plain 1/dv (TendencyTerms), while
    # del2_e above used the dv >= 0.25 dc floor (Del2AuxVars)
    du = []
    for i in range(3):
        du.append(pv[i]
                  - gke[i] * inv_dc
                  - grav * gssh[i] * inv_dc
                  + nu2 * scal2 * (cdd[i] * inv_dc - vdr[i] * inv_dv)
                  - nu4 * scal4 * (div_factor * cd4[i] * inv_dc
                                   - vd4[i] * inv_dv))
    # wind/drag use the FB momentum-aux level (mean_h of h_new)
    du = _wind_drag(du, u, mean_hn, ke, wslab, consts, ap)
    un = [u[i] + dt * du[i] for i in range(3)]
    un, trn = _vmix_apply(h_new, un, trn, tabs, consts, even, L)
    return h_new, un, trn


def _tend_compute(h, u, tr, even, tabs, consts, L, wslab=None):
    """compute_all_tendencies on one VMEM slab: every aux variable at the
    SAME (h, u, tr) time level (tendencies.py:178-186), unlike the FB
    chain which re-evaluates momentum aux on h_new. Radius 6.

    Returns (dh, du, dtr) as slab tendencies (du/dtr are channel lists).
    """
    (dt, grav, nu2, nu4, div_factor, ed2, ed4, inv_dc, inv_dv, inv_dv_floor,
     geo, f0v, scal2, scal4) = consts[:14]

    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)

    # --- thickness: dh = -div(flux_h u)
    mean_h, flux_h = _h_fluxes(h, u, consts, ap)
    F = [flux_h[i] * u[i] for i in range(3)]
    dh = -ap("div", F, 1)[0]

    # --- tracers (center/upwind flux + del2 + del4), all on level h
    dtr = []
    for l in range(L):
        htr = _htr_flux(h, tr[l], u, mean_h, consts, ap)
        adv = -ap("div", [htr[i] * u[i] for i in range(3)], 1)[0]
        ctr = ap("cdiff", [tr[l]], 3)
        d2tr = ap("signed_div",
                  [geo * mean_h[i] * ctr[i] for i in range(3)],
                  1)[0]
        cd2 = ap("cdiff", [d2tr], 3)
        hyp = ap("signed_div", [geo * scal4 * cd2[i]
                                for i in range(3)], 1)[0]
        dtr.append(adv + ed2 * scal2 * d2tr - ed4 * hyp)

    # --- velocity aux on (h, u) — the same level (RK semantics)
    ke = ap("ke", [ui * ui for ui in u], 1)[0]
    div_u = ap("div", u, 1)[0]
    rvort = ap("curl", u, 2)
    h_v = ap("kite", [h], 2)
    nrv = [rvort[i] / h_v[i] for i in range(2)]
    npv = [f0v / h_v[i] for i in range(2)]
    nrv_e = ap("vmean", nrv, 3)
    npv_e = ap("vmean", npv, 3)
    q_e = [nrv_e[i] + npv_e[i] for i in range(3)]

    cdd = ap("cdiff", [div_u], 3)
    vdr = ap("vdiff", rvort, 3)
    del2_e = [cdd[i] * inv_dc - vdr[i] * inv_dv_floor
              for i in range(3)]
    del2_div = ap("div", del2_e, 1)[0]
    del2_rv = ap("curl", del2_e, 2)

    tf = ap("tang", F, 3)
    tfq = ap("tang", [F[i] * q_e[i] for i in range(3)], 3)
    pv = [0.5 * (q_e[i] * tf[i] + tfq[i]) for i in range(3)]

    gke = ap("cdiff", [ke], 3)
    gssh = ap("cdiff", [h], 3)           # stacked ssh, uniform depth
    cd4 = ap("cdiff", [del2_div], 3)
    vd4 = ap("vdiff", del2_rv, 3)

    du = []
    for i in range(3):
        du.append(pv[i]
                  - gke[i] * inv_dc
                  - grav * gssh[i] * inv_dc
                  + nu2 * scal2 * (cdd[i] * inv_dc - vdr[i] * inv_dv)
                  - nu4 * scal4 * (div_factor * cd4[i] * inv_dc
                                   - vd4[i] * inv_dv))
    # RK semantics: momentum aux at the same level, mean_h of h
    du = _wind_drag(du, u, mean_h, ke, wslab, consts, ap)
    return dh, du, dtr


def _rk2_compute(h, u, tr, even, tabs, consts, L, wslab=None):
    """Midpoint RK2 (steppers.rk2_step) on one VMEM slab: two radius-6
    tendency chains back to back (total radius 12 <= R_RK2). Garbage
    slab-edge values can divide by ~0 in the tracer mid-state; the
    resulting non-finites stay outside the owned center by the same
    radius accounting as any other creep."""
    dt = consts[0]

    dh1, du1, dtr1 = _tend_compute(h, u, tr, even, tabs, consts, L, wslab)
    h_mid = h + (0.5 * dt) * dh1
    u_mid = [u[i] + (0.5 * dt) * du1[i] for i in range(3)]
    tr_mid = [(tr[l] * h + (0.5 * dt) * dtr1[l]) / h_mid for l in range(L)]

    dh2, du2, dtr2 = _tend_compute(h_mid, u_mid, tr_mid, even, tabs,
                                   consts, L, wslab)
    h_new = h + dt * dh2
    un = [u[i] + dt * du2[i] for i in range(3)]
    trn = [(tr[l] * h + dt * dtr2[l]) / h_new for l in range(L)]
    un, trn = _vmix_apply(h_new, un, trn, tabs, consts, even, L)
    return h_new, un, trn


def _split_off_wind(slabs, L, nblocks_in):
    """Inputs carry an optional trailing wind channel (lanes 0..2 = the
    per-edge-class normal stress): detach it from the state blocks."""
    nbase = nblocks_in * (4 + L)
    if len(slabs) == nbase + 1:
        return slabs[:nbase], slabs[nbase]
    return slabs, None


def _state_compute(fn):
    """Adapt an (h, u, tr) -> (h, u, tr) chain to the kernel's flat
    slab-list interface (slabs[0]=h, [1:4]=u, [4:4+L]=tracers, optional
    trailing wind channel)."""
    def wrapped(slabs, even, tabs, consts, L):
        slabs, wslab = _split_off_wind(slabs, L, 1)
        h_new, un, trn = fn(slabs[0], slabs[1:4], slabs[4:4 + L],
                            even, tabs, consts, L, wslab)
        return [h_new] + list(un) + list(trn)
    return wrapped


# ---- RK4 stage kernels (RungeKutta4Stepper.cpp:68-137 semantics) ----
# Each stage runs ONE radius-6 tendency chain (same R=8 ring as FB);
# the step is four kernel launches threading (acc, prov) 2CH arrays:
#   s1: state            -> acc = state + b0 dt k1 ; prov1
#   s2: state, acc, prov -> acc += b1 dt k2 ; prov2     (a=1/2)
#   s3: state, acc, prov -> acc += b2 dt k3 ; prov3     (a=1)
#   s4: acc, prov        -> final (tracers = tr_acc / h_acc)
# Tracer accumulators live in thickness-weighted tr*h units, exactly as
# the composed rk4_step / the reference's weightTracers machinery
# (TimeStepper.h:205-237).

def _stage_out(dt, b, h, u, tr_h, dh, du, dtr, acc, a, L):
    """acc' = acc + b dt k ; prov = state + a dt k  (tr via tr_h)."""
    accp = ([acc[0] + b * dt * dh]
            + [acc[1 + i] + b * dt * du[i] for i in range(3)]
            + [acc[4 + l] + b * dt * dtr[l] for l in range(L)])
    hp = h + a * dt * dh
    prov = ([hp] + [u[i] + a * dt * du[i] for i in range(3)]
            + [(tr_h[l] + a * dt * dtr[l]) / hp for l in range(L)])
    return accp + prov


def _rk4_s1(slabs, even, tabs, consts, L):
    dt = consts[0]
    slabs, wslab = _split_off_wind(slabs, L, 1)
    h, u, tr = slabs[0], slabs[1:4], slabs[4:4 + L]
    dh, du, dtr = _tend_compute(h, u, tr, even, tabs, consts, L, wslab)
    tr_h = [tr[l] * h for l in range(L)]
    acc0 = [h] + list(u) + tr_h
    return _stage_out(dt, 1.0 / 6.0, h, u, tr_h, dh, du, dtr,
                      acc0, 0.5, L)


def _rk4_mid(a, b):
    def fn(slabs, even, tabs, consts, L):
        dt = consts[0]
        CH = 4 + L
        slabs, wslab = _split_off_wind(slabs, L, 3)
        st, acc, prov = slabs[:CH], slabs[CH:2 * CH], slabs[2 * CH:]
        h, u = st[0], st[1:4]
        tr_h = [st[4 + l] * h for l in range(L)]
        dh, du, dtr = _tend_compute(prov[0], prov[1:4], prov[4:],
                                    even, tabs, consts, L, wslab)
        return _stage_out(dt, b, h, u, tr_h, dh, du, dtr, acc, a, L)
    return fn


def _rk4_s4(slabs, even, tabs, consts, L):
    dt = consts[0]
    CH = 4 + L
    slabs, wslab = _split_off_wind(slabs, L, 2)
    acc, prov = slabs[:CH], slabs[CH:]
    dh, du, dtr = _tend_compute(prov[0], prov[1:4], prov[4:],
                                even, tabs, consts, L, wslab)
    b = 1.0 / 6.0
    h_new = acc[0] + b * dt * dh
    un = [acc[1 + i] + b * dt * du[i] for i in range(3)]
    trn = [(acc[4 + l] + b * dt * dtr[l]) / h_new for l in range(L)]
    un, trn = _vmix_apply(h_new, un, trn, tabs, consts, even, L)
    return [h_new] + un + trn


# ---- split-explicit stage kernels (stepping/split.py semantics) ----
# The slow 3-D work of split_forward_backward_step runs as TWO fused
# kernels around the resident barotropic-subcycle kernel
# (ops/barotropic_kernel.py):
#   splitpre:  state -> (uprime, du_slow, packed 2-D barotropic inputs)
#   [btk.bt_subcycles on the packed 2-D fields]
#   splitpost: state + pre-outputs + packed 2-D results -> new state
# 2-D (E,1)/(C,1) fields ride in the LANES of one extra K128 channel
# (lane j = field j) because tile out-DMAs need 128-multiple lane
# extents — a (10, ny, nx) output with nx tiled at bx=32 would violate
# the Pallas DMA lane rule.

def _lane_mask(x, K):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return lane < K


def _vel_tend_column(h, u, sshc, even, tabs, consts, L):
    """compute_velocity_tendency at (h, u) with the COLUMN ssh gradient
    (cfg.ssh_formulation='column'): identical to the velocity section of
    _tend_compute except gssh reads the shared free surface sshc
    (Y, X, 1) instead of the per-layer stacked h."""
    (dt, grav, nu2, nu4, div_factor, ed2, ed4, inv_dc, inv_dv, inv_dv_floor,
     geo, f0v, scal2, scal4) = consts[:14]
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)

    mean_h = ap("cmean", [h], 3)
    F = [mean_h[i] * u[i] for i in range(3)]
    ke = ap("ke", [ui * ui for ui in u], 1)[0]
    div_u = ap("div", u, 1)[0]
    rvort = ap("curl", u, 2)
    h_v = ap("kite", [h], 2)
    nrv = [rvort[i] / h_v[i] for i in range(2)]
    npv = [f0v / h_v[i] for i in range(2)]
    nrv_e = ap("vmean", nrv, 3)
    npv_e = ap("vmean", npv, 3)
    q_e = [nrv_e[i] + npv_e[i] for i in range(3)]

    cdd = ap("cdiff", [div_u], 3)
    vdr = ap("vdiff", rvort, 3)
    del2_e = [cdd[i] * inv_dc - vdr[i] * inv_dv_floor for i in range(3)]
    del2_div = ap("div", del2_e, 1)[0]
    del2_rv = ap("curl", del2_e, 2)

    tf = ap("tang", F, 3)
    tfq = ap("tang", [F[i] * q_e[i] for i in range(3)], 3)
    pv = [0.5 * (q_e[i] * tf[i] + tfq[i]) for i in range(3)]

    gke = ap("cdiff", [ke], 3)
    gssh = ap("cdiff", [sshc], 3)
    cd4 = ap("cdiff", [del2_div], 3)
    vd4 = ap("vdiff", del2_rv, 3)

    du = []
    for i in range(3):
        du.append(pv[i]
                  - gke[i] * inv_dc
                  - grav * gssh[i] * inv_dc
                  + nu2 * scal2 * (cdd[i] * inv_dc - vdr[i] * inv_dv)
                  - nu4 * scal4 * (div_factor * cd4[i] * inv_dc
                                   - vd4[i] * inv_dv))
    return du, mean_h


def _split_pre(slabs, even, tabs, consts, L):
    """Mode split + slow forcing (split.py:77-103). consts[NCONST:] =
    (K, depth, f_edge, bt_drag). Emits 7 channels:
    uprime x3, du_slow x3, packed 2-D (lanes: ubar x3, sshc,
    g_slow x3, het x3 — barotropic_kernel input order)."""
    (dt, grav) = consts[0], consts[1]
    inv_dc = consts[7]
    K, depth, f_e, r_drag = consts[NCONST:NCONST + 4]
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)
    h, u = slabs[0], slabs[1:4]

    lm = _lane_mask(h, K)
    msum = lambda x: jnp.sum(jnp.where(lm, x, 0.0), axis=-1, keepdims=True)

    mean_h = ap("cmean", [h], 3)
    het = [msum(mean_h[i]) for i in range(3)]
    ubar = [msum(mean_h[i] * u[i]) / het[i] for i in range(3)]
    uprime = [u[i] - ubar[i] for i in range(3)]

    sshc = msum(h) - depth
    du_full, _ = _vel_tend_column(h, u, sshc, even, tabs, consts, L)
    du_bar = [msum(mean_h[i] * du_full[i]) / het[i] for i in range(3)]
    du_slow = [du_full[i] - du_bar[i] for i in range(3)]

    gssh = ap("cdiff", [sshc], 3)
    tg = ap("tang", ubar, 3)
    fast0 = [-grav * inv_dc * gssh[i] + f_e * tg[i] - r_drag * ubar[i]
             for i in range(3)]
    g_slow = [du_bar[i] - fast0[i] for i in range(3)]

    # lane order mirrors barotropic_kernel's stacked input:
    # ubar x3, ssh, g_slow x3, h_edge_tot x3
    fields = ubar + [sshc] + g_slow + het            # 10 x (Y, X, 1)
    Kp = h.shape[-1]
    packed = jnp.concatenate(
        fields + [jnp.zeros(h.shape[:-1] + (Kp - len(fields),), h.dtype)],
        axis=-1)
    return uprime + du_slow + [packed]


def _split_post(slabs, even, tabs, consts, L):
    """Baroclinic recombine + thickness/tracer advance with the averaged
    transport velocity (split.py:140-152). Input channels: state
    (h, u x3, tr xL), pre-outputs (uprime x3, du_slow x3, packed-A),
    packed 2-D results (lanes: ub_final x3, ubar_avg x3)."""
    (dt, grav, nu2, nu4, div_factor, ed2, ed4, inv_dc, inv_dv, inv_dv_floor,
     geo, f0v, scal2, scal4) = consts[:14]
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)
    CH = 4 + L
    h, tr = slabs[0], slabs[4:CH]
    uprime, du_slow = slabs[CH:CH + 3], slabs[CH + 3:CH + 6]
    res = slabs[CH + 7]
    ubf = [res[..., i:i + 1] for i in range(3)]
    ubavg = [res[..., 3 + i:4 + i] for i in range(3)]

    u_new = [uprime[i] + dt * du_slow[i] + ubf[i] for i in range(3)]
    u_trans = [uprime[i] + ubavg[i] for i in range(3)]

    mean_h = ap("cmean", [h], 3)
    dh = ap("div", [mean_h[i] * u_trans[i] for i in range(3)], 1)[0]
    h_new = h + dt * (-dh)

    trn = []
    for l in range(L):
        htr = ap("cmean", [h * tr[l]], 3)
        adv = -ap("div", [htr[i] * u_trans[i] for i in range(3)], 1)[0]
        ctr = ap("cdiff", [tr[l]], 3)
        d2tr = ap("signed_div",
                  [geo * mean_h[i] * ctr[i] for i in range(3)], 1)[0]
        cd2 = ap("cdiff", [d2tr], 3)
        hyp = ap("signed_div", [geo * scal4 * cd2[i]
                                for i in range(3)], 1)[0]
        dtr = adv + ed2 * scal2 * d2tr - ed4 * hyp
        trn.append((tr[l] * h + dt * dtr) / h_new)
    return [h_new] + u_new + trn


_COMPUTE = {
    "fb": _state_compute(_fb_compute),
    "rk2": _state_compute(_rk2_compute),
    "rk4s1": _rk4_s1,
    "rk4s2": _rk4_mid(0.5, 1.0 / 3.0),
    "rk4s3": _rk4_mid(1.0, 1.0 / 3.0),
    "rk4s4": _rk4_s4,
    "splitpre": _split_pre,
    "splitpost": _split_post,
}


def _kernel(*refs, tabs, consts, L, ny, nx, K, by, bx, nby, nbx,
            ry, rx, compute, nin, parity):
    """Slab-resident step over native (CH_i, ny, nx, K) state arrays.

    refs = nin input arrays + 1 output array; the inputs' channels are
    stacked into one (CHT, by+2ry, bx+2rx) slab per tile (multi-input
    support exists for the RK4 stage kernels, whose stages read state /
    accumulator / provisional arrays side by side). Each tile's input
    slab is assembled by 9 rectangle DMAs per input (3 y-bands x 3
    x-bands); the halo bands wrap with a mod-n start offset, so no
    padded copy of the state ever exists in HBM. Requires by >= ry and
    bx >= rx (band contiguity).

    parity: ny is the split-plane row count (full ny/2), channels come
    interleaved [c0_even, c0_odd, c1_even, ...], and `compute` sees one
    (2, YY, XX, K) stack per logical channel (see _apply)."""
    s_hbms = refs[:nin]
    o_hbm = refs[nin]
    CHs = [s.shape[0] for s in s_hbms]
    offs = [0]
    for c in CHs:
        offs.append(offs[-1] + c)
    CHT = offs[-1]
    CHO = o_hbm.shape[0]
    YY, XX = by + 2 * ry, bx + 2 * rx

    def body(in_s, out_s, sem):
        nblocks = nby * nbx
        cp = pltpu.make_async_copy

        def _interior(bidx):
            biy = bidx // nbx
            bix = bidx % nbx
            return ((biy > 0) & (biy < nby - 1)
                    & (bix > 0) & (bix < nbx - 1))

        def in_dmas_interior(slot, bidx):
            # tiles whose halo ring does not touch the wrap read ONE
            # contiguous slab per input (small-rectangle DMAs measured
            # ~3x off peak HBM bandwidth; one big rect is near it)
            biy = bidx // nbx
            bix = bidx % nbx
            return tuple(
                cp(s.at[:, pl.ds(biy * by - ry, by + 2 * ry),
                        pl.ds(bix * bx - rx, bx + 2 * rx)],
                   in_s.at[slot, pl.ds(offs[i], CHs[i])],
                   sem.at[9 * (slot * nin + i)])
                for i, s in enumerate(s_hbms))

        def in_dmas_wrap(slot, bidx):
            biy = bidx // nbx
            bix = bidx % nbx
            y0 = biy * by
            x0 = bix * bx
            # (src_start, length, slab_start) per band; halo bands are
            # contiguous mod n because the tile edge is at least r from
            # the wrap except when it IS the wrap (then start is exact)
            ybands = (((y0 - ry + ny) % ny, ry, 0),
                      (y0, by, ry),
                      ((y0 + by) % ny, ry, ry + by))
            xbands = (((x0 - rx + nx) % nx, rx, 0),
                      (x0, bx, rx),
                      ((x0 + bx) % nx, rx, rx + bx))
            dmas = []
            for i, s in enumerate(s_hbms):
                for yi, (sy, ly, dy) in enumerate(ybands):
                    for xi, (sx, lx, dx) in enumerate(xbands):
                        dmas.append(cp(
                            s.at[:, pl.ds(sy, ly), pl.ds(sx, lx)],
                            in_s.at[slot, pl.ds(offs[i], CHs[i]),
                                    pl.ds(dy, ly), pl.ds(dx, lx)],
                            sem.at[9 * (slot * nin + i) + 3 * yi + xi]))
            return dmas

        # the interior fast path only exists when the grid has interior
        # tiles (and its full-slab slice is then statically in bounds)
        has_interior = nby > 2 and nbx > 2

        def start_in(slot, bidx):
            if not has_interior:
                for d in in_dmas_wrap(slot, bidx):
                    d.start()
                return

            @pl.when(_interior(bidx))
            def _():
                for d in in_dmas_interior(slot, bidx):
                    d.start()

            @pl.when(jnp.logical_not(_interior(bidx)))
            def _():
                for d in in_dmas_wrap(slot, bidx):
                    d.start()

        def wait_in(slot, bidx):
            if not has_interior:
                for d in in_dmas_wrap(slot, bidx):
                    d.wait()
                return

            @pl.when(_interior(bidx))
            def _():
                for d in in_dmas_interior(slot, bidx):
                    d.wait()

            @pl.when(jnp.logical_not(_interior(bidx)))
            def _():
                for d in in_dmas_wrap(slot, bidx):
                    d.wait()

        def out_dmas(slot, bidx):
            biy = bidx // nbx
            bix = bidx % nbx
            return (cp(out_s.at[slot],
                       o_hbm.at[:, pl.ds(biy * by, by), pl.ds(bix * bx, bx)],
                       sem.at[18 * nin + slot]),)

        start_in(0, 0)

        def loop(bidx, _):
            cur = bidx % 2
            nxt = (bidx + 1) % 2
            biy = bidx // nbx

            @pl.when(bidx + 1 < nblocks)
            def _():
                start_in(nxt, bidx + 1)

            wait_in(cur, bidx)

            if parity:
                # plane membership IS the parity — no row iota needed
                even = None
                slabs = [in_s[cur, 2 * ch:2 * ch + 2]
                         for ch in range(CHT // 2)]
            else:
                # destination-row parity: global row of slab row iy is
                # biy*by - R + iy (mod ny); ny even so parity is exact.
                # Shape (YY, XX, 1): broadcasts over lanes, and keeps
                # 1-lane (2-D) chain values from inflating to K lanes.
                row = (biy * by - ry) + jax.lax.broadcasted_iota(
                    jnp.int32, (YY, XX, 1), 0)
                even = (row % 2) == 0
                slabs = [in_s[cur, ch] for ch in range(CHT)]

            if os.environ.get("OMEGA_MEGA_NOP") == "1":
                # diagnostic: pure-DMA roofline of this kernel (copy
                # through, no stencil work) — NOT a time step
                outs = slabs[:CHO // 2 if parity else CHO]
            else:
                outs = compute(slabs, even, tabs, consts, L)

            # --- write owned centers (wait for this slot's previous
            # write to drain before overwriting)
            @pl.when(bidx >= 2)
            def _():
                for d in out_dmas(cur, bidx - 2):
                    d.wait()

            c = slice(ry, ry + by)
            cx = slice(rx, rx + bx)
            if parity:
                for ch in range(CHO // 2):
                    out_s[cur, 2 * ch] = outs[ch][0, c, cx]
                    out_s[cur, 2 * ch + 1] = outs[ch][1, c, cx]
            else:
                for ch in range(CHO):
                    out_s[cur, ch] = outs[ch][c, cx]

            for d in out_dmas(cur, bidx):
                d.start()

        jax.lax.fori_loop(0, nblocks, loop, None)

        @pl.when(nblocks >= 2)
        def _():
            for d in out_dmas((nblocks - 2) % 2, nblocks - 2):
                d.wait()
        for d in out_dmas((nblocks - 1) % 2, nblocks - 1):
            d.wait()

    pl.run_scoped(
        body,
        in_s=pltpu.VMEM((2, CHT, YY, XX, K), s_hbms[0].dtype),
        out_s=pltpu.VMEM((2, CHO, by, bx, K), s_hbms[0].dtype),
        sem=pltpu.SemaphoreType.DMA((18 * nin + 2,)),
    )


def _pick_tile(ny, nx, kind="fb", vmix=False):
    """Largest (by, bx) tile dividing (ny, nx) under a VMEM-driven cap
    (OMEGA_MEGA_TILE accepts '16' or '16x32' for rectangular tiles).
    RK2's wider ring (R_RK2) wants a bigger default tile to hold the
    halo read amplification at (32+24)^2/32^2 = 3.1x."""
    if kind == "rk2":
        spec = os.environ.get("OMEGA_MEGA_TILE_RK2", "32")
    else:
        # default 16 since round 4: with the parity-split row layout
        # tile 16 measured 4.83 ms vs 4.91 at tile 32 on the 256^2x100
        # flagship (the r2 "tile 32 wins" A/B predates parity rows),
        # and the in-kernel vmix PCR makes the tile-32 Mosaic compile
        # blow up (>25 min vs 32 s / 8.11 ms at 16)
        spec = os.environ.get("OMEGA_MEGA_TILE", "16")
    if "x" in spec:
        cy, cx = (int(v) for v in spec.split("x"))
    else:
        cy = cx = int(spec)

    def pick(n, cap):
        b = min(cap, n)
        while n % b:
            b -= 1
        return b
    return pick(ny, cy), pick(nx, cx)


@functools.partial(jax.jit, static_argnames=(
    "tabs", "consts", "L", "ny", "nx", "interpret", "kind", "out_ch",
    "parity", "extra_ring"))
def _call(*stacked, tabs, consts, L, ny, nx, interpret, kind="fb",
          out_ch=None, parity=False, extra_ring=0):
    K = stacked[0].shape[-1]
    if parity:
        ny = ny // 2          # stacked rows are split-plane rows
    by, bx = _pick_tile(ny, nx, kind,
                        vmix=len(consts) > 17 and consts[17] is not None)
    ry, rx = _rings(kind, parity, extra_ring)
    CHO = stacked[0].shape[0] if out_ch is None else out_ch
    if parity and out_ch is not None:
        CHO = 2 * out_ch
    # VMEM-driven tile fallback: the double-buffered in/out slabs must
    # leave room for the chain's live-value stack inside the scoped
    # budget (parity RK4 stages carry 36 input channels — at tile 32
    # their buffers alone were 96MB and Mosaic OOMed the 120MB scope).
    # Shrink the tile until buffers fit ~60% of the scope; the chain
    # stack has measured well under the remainder at these tile sizes.
    CHT = sum(s.shape[0] for s in stacked)
    budget = 0.6 * int(os.environ.get("OMEGA_MEGA_VMEM_MB", "120")) * 2**20
    itemsize = stacked[0].dtype.itemsize

    def bufbytes(by_, bx_):
        return (2 * CHT * (by_ + 2 * ry) * (bx_ + 2 * rx) * K
                + 2 * CHO * by_ * bx_ * K) * itemsize

    while bufbytes(by, bx) > budget and max(by, bx) > 8:
        cap = max(by, bx) // 2
        by, bx = min(by, cap), min(bx, cap)
        while ny % by:
            by -= 1
        while nx % bx:
            bx -= 1
    kern = functools.partial(_kernel, tabs=dict(tabs), consts=consts, L=L,
                             ny=ny, nx=nx, K=K, by=by, bx=bx,
                             nby=ny // by, nbx=nx // bx,
                             ry=ry, rx=rx, compute=_COMPUTE[kind],
                             nin=len(stacked), parity=parity)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((CHO, ny, nx, K), stacked[0].dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(stacked),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        # larger tiles shrink the halo-ring read amplification
        # ((by+2R)(bx+2R)/(by*bx): 4x at 16, 2.25x at 32) but their
        # chain live-set exceeds the 16MB default scoped budget; v5e
        # has 128MB VMEM (measured working for the sphere kernel)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "OMEGA_MEGA_VMEM_MB", "120")) * 1024 * 1024),
        interpret=interpret,
    )(*stacked)


def _mega_args(mesh, cfg, dt):
    tc = cfg.tendencies
    vm = cfg.vert_mix
    us = lambda a: structured.uniform_scalar(mesh, a)
    dc, dv = us("dc_edge"), us("dv_edge")
    inv_dv_floor = 1.0 / max(dv, 0.25 * dc)
    vmix = _vmix_on(cfg)
    pp81 = None
    if vmix and vm.scheme == "pp81":
        pp81 = (vm.nu0, vm.alpha, vm.n_exp, vm.eos_alpha_t,
                vm.eos_beta_s, vm.temp_index, vm.salt_index,
                vm.kappa_tracer, vm.kappa_momentum)
    consts = (float(dt), cfg.gravity, tc.visc_del2, tc.visc_del4,
              tc.div_factor, tc.eddy_diff2, tc.eddy_diff4,
              1.0 / dc, 1.0 / dv, inv_dv_floor,
              dv / dc,                       # geo (edge_mask == 1)
              us("f_vertex"),
              us("mesh_scaling_del2"), us("mesh_scaling_del4"),
              # physics extensions (indices 14..19, see NCONST)
              cfg.nvertlayers, tc.density0,
              tc.bottom_drag_coeff if tc.bottom_drag else 0.0,
              vm.kappa_tracer if vmix else None,
              vm.kappa_momentum if vmix else None,
              pp81,
              cfg.flux_thickness_type == "upwind",
              cfg.flux_tracer_type == "upwind",
              cfg.flux_tracer_type == "fct")
    names = ("div", "ke", "curl", "kite", "tang", "cdiff", "cmean",
             "vdiff", "vmean", "signed_div", "c0", "c1")
    if cfg.flux_tracer_type == "fct":
        names = names + ("div_pos", "div_neg") + tuple(
            f"coc{j}" for j in range(6))
    tabs = tuple((n, _table(mesh, n)) for n in names)
    return tabs, consts


def stack_wind(mesh, cfg, wind_stress, dtype, parity=None):
    """Pack the edge normal wind stress into one kernel input channel:
    (1, ny, nx, K128) with lane t = edge-class-t stress (class-major edge
    ids, mesh/planar.py). wind_stress = (zonal_cell, merid_cell); the
    rotation onto edge normals (WindForcingAuxVars.h:13-40) runs once
    here, outside the kernel."""
    from omega_tpu.core import aux as auxmod
    stress = auxmod.wind_normal_stress(mesh, cfg, wind_stress[0],
                                       wind_stress[1])
    nx, ny = mesh.structured_nx, mesh.structured_ny
    Kp = 128
    sg = jnp.asarray(stress, dtype).reshape(3, ny, nx)
    w = jnp.zeros((1, ny, nx, Kp), dtype)
    for t in range(3):
        w = w.at[0, :, :, t].set(sg[t])
    if parity is None:
        parity = parity_enabled()
    return split_parity(w, ny) if parity else w


def split_parity(stacked, ny):
    """(CH, ny, nx, K) -> (2CH, ny/2, nx, K): channel 2c+p holds rows
    of global parity p (once per run; the step keeps the split form)."""
    CH, _, nx, K = stacked.shape
    s = stacked.reshape(CH, ny // 2, 2, nx, K)
    return jnp.swapaxes(s, 1, 2).reshape(2 * CH, ny // 2, nx, K)


def unsplit_parity(stacked, ny):
    CH2, ny2, nx, K = stacked.shape
    s = stacked.reshape(CH2 // 2, 2, ny2, nx, K)
    return jnp.swapaxes(s, 1, 2).reshape(CH2 // 2, ny, nx, K)


def stack_state(mesh, state, parity=None):
    """ModelState -> the kernel's stacked (1+3+L, ny, nx, K128) layout
    ((2(1+3+L), ny/2, nx, K128) in parity-split mode; parity=None reads
    OMEGA_MEGA_PARITY, the split-explicit path forces False).

    K pads to the 128-lane boundary ONCE here: h pads with 1.0 (keeps
    the kernel's tracer h-division finite in dead lanes), u/tracers with
    0.0; dead lanes then stay inert across any number of steps."""
    nx, ny = mesh.structured_nx, mesh.structured_ny
    h, u, tr = state
    K = h.shape[-1]
    L = tr.shape[0]
    Kp = -(-K // 128) * 128
    hg = h.reshape(1, ny, nx, K)
    ug = u.reshape(3, ny, nx, K)
    trg = tr.reshape(L, ny, nx, K)
    if Kp != K:
        pad = ((0, 0), (0, 0), (0, 0), (0, Kp - K))
        hg = jnp.pad(hg, pad, constant_values=1.0)
        ug = jnp.pad(ug, pad)
        trg = jnp.pad(trg, pad)
    out = jnp.concatenate([hg, ug, trg], axis=0)
    if parity is None:
        parity = parity_enabled()
    return split_parity(out, ny) if parity else out


def unstack_state(mesh, stacked, K, L, state_type):
    nx, ny = mesh.structured_nx, mesh.structured_ny
    if stacked.shape[0] == 2 * (4 + L):
        stacked = unsplit_parity(stacked, ny)
    s = stacked[..., :K] if stacked.shape[-1] != K else stacked
    return state_type(h=s[0].reshape(ny * nx, K),
                      u=s[1:4].reshape(3 * ny * nx, K),
                      tracers=s[4:].reshape(L, ny * nx, K))


def fb_megastep_stacked(mesh, cfg, stacked, dt, interpret=None, wind=None):
    """One FB step on the stacked layout (stacked -> stacked): exactly
    one kernel launch, zero glue. Used directly by run_steps' scan.
    `wind` is an optional stack_wind channel (constant per segment)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tabs, consts = _mega_args(mesh, cfg, dt)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    par = parity_enabled()
    L = stacked.shape[0] // (2 if par else 1) - 4
    args = (stacked,) if wind is None else (stacked, wind)
    return _call(*args, tabs=tabs, consts=consts, L=L, ny=ny, nx=nx,
                 interpret=interpret, parity=par,
                 out_ch=None if wind is None else 4 + L,
                 extra_ring=1 if consts[17] is not None else 0)


def _wind_arg(mesh, cfg, wind_stress, dtype, parity=None):
    if wind_stress is None or not cfg.tendencies.wind_forcing:
        return None
    return stack_wind(mesh, cfg, wind_stress, dtype, parity)


def fb_megastep(mesh, cfg, state, t, dt, interpret=None, wind_stress=None):
    """One forward-backward step (== stepping.forward_backward_step) for
    the supported flagship configuration."""
    h, _, tr = state
    stacked = stack_state(mesh, state)
    wind = _wind_arg(mesh, cfg, wind_stress, h.dtype)
    out = fb_megastep_stacked(mesh, cfg, stacked, dt, interpret=interpret,
                              wind=wind)
    return unstack_state(mesh, out, h.shape[-1], tr.shape[0], type(state))


def rk2_megastep_stacked(mesh, cfg, stacked, dt, interpret=None, wind=None):
    """One midpoint-RK2 step on the stacked layout: both tendency
    evaluations fused into the one kernel (ring R_RK2 >= 12)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tabs, consts = _mega_args(mesh, cfg, dt)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    par = parity_enabled()
    L = stacked.shape[0] // (2 if par else 1) - 4
    args = (stacked,) if wind is None else (stacked, wind)
    return _call(*args, tabs=tabs, consts=consts, L=L, ny=ny, nx=nx,
                 interpret=interpret, kind="rk2", parity=par,
                 out_ch=None if wind is None else 4 + L,
                 extra_ring=1 if consts[17] is not None else 0)


def rk2_megastep(mesh, cfg, state, t, dt, interpret=None, wind_stress=None):
    """One RK2 step (== stepping.rk2_step) for the supported flagship
    configuration. Single-device only: the fused two-chain radius (12)
    exceeds any halo width, so sharded runs keep the composed stepper."""
    h, _, tr = state
    stacked = stack_state(mesh, state)
    wind = _wind_arg(mesh, cfg, wind_stress, h.dtype)
    out = rk2_megastep_stacked(mesh, cfg, stacked, dt, interpret=interpret,
                               wind=wind)
    return unstack_state(mesh, out, h.shape[-1], tr.shape[0], type(state))


def rk4_megastep_stacked(mesh, cfg, stacked, dt, interpret=None, wind=None):
    """One classic-RK4 step on the stacked layout as FOUR stage kernels
    (one radius-6 tendency chain each, standard R ring), threading the
    (acc, prov) channels through HBM between launches."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tabs, consts = _mega_args(mesh, cfg, dt)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    par = parity_enabled()
    L = stacked.shape[0] // (2 if par else 1) - 4
    kw = dict(tabs=tabs, consts=consts, L=L, ny=ny, nx=nx,
              interpret=interpret, parity=par)
    w = () if wind is None else (wind,)
    CH = 4 + L
    ap_ = _call(stacked, *w, kind="rk4s1", out_ch=2 * CH, **kw)
    ap_ = _call(stacked, ap_, *w, kind="rk4s2", out_ch=2 * CH, **kw)
    ap_ = _call(stacked, ap_, *w, kind="rk4s3", out_ch=2 * CH, **kw)
    return _call(ap_, *w, kind="rk4s4", out_ch=CH, **kw)


def split_supported(mesh, cfg) -> bool:
    """The fused split-explicit path: flagship tendency configuration
    with the COLUMN free surface and uniform f_edge for the barotropic
    Coriolis.  The split kernels always use the plain (non-parity)
    layout — the 2-D lane packing is parity-naive — so this path works
    regardless of OMEGA_MEGA_PARITY (its stack_state forces
    parity=False)."""
    import dataclasses

    from omega_tpu.ops import barotropic_kernel as btk
    cfg_stacked = dataclasses.replace(cfg, ssh_formulation="stacked")
    tc = cfg.tendencies
    return (cfg.ssh_formulation == "column"
            and supported(mesh, cfg_stacked, parity=False)
            # the split kernels are center-flux only
            and cfg.flux_thickness_type == "center"
            and cfg.flux_tracer_type == "center" 
            # the split kernels predate the fused physics: wind/drag/
            # vmix configs run the composed split stepper
            and not cfg.vert_mix.enabled
            and not tc.wind_forcing and not tc.bottom_drag
            and btk.supported(mesh)
            and structured.uniform_scalar(mesh, "f_edge") is not None)


def split_megastep_stacked(mesh, cfg, stacked, dt, n_subcycles=10,
                           bt_drag=0.0, interpret=None):
    """One split-explicit step on the stacked layout: splitpre kernel ->
    resident barotropic-subcycle kernel -> splitpost kernel.  Matches
    stepping.split.split_forward_backward_step on the supported
    configuration (same mode split, frozen slow forcing, averaged
    transport velocity)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from omega_tpu.ops import barotropic_kernel as btk
    tabs, consts = _mega_args(mesh, cfg, dt)
    us = lambda a: structured.uniform_scalar(mesh, a)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    L = stacked.shape[0] - 4
    K = None  # true K is carried by the caller via cfg
    K = cfg.nvertlayers
    consts_pre = consts + (K, us("bottom_depth"), us("f_edge"),
                           float(bt_drag))
    kw = dict(tabs=tabs, L=L, ny=ny, nx=nx, interpret=interpret)

    pre = _call(stacked, consts=consts_pre, kind="splitpre", out_ch=7, **kw)

    # --- barotropic subcycles on the packed 2-D fields (lane j = field)
    packed = pre[6]                                   # (ny, nx, Kp)
    bt_in = jnp.moveaxis(packed[..., :10], -1, 0)     # (10, ny, nx)
    consts_bt = (float(dt) / n_subcycles, cfg.gravity,
                 1.0 / us("dc_edge"), us("f_edge"), float(bt_drag))
    bt_tabs = tuple((n, _table(mesh, n)) for n in ("div", "cdiff", "tang"))
    bt_out = btk._call(bt_in, tabs=bt_tabs, consts=consts_bt, ny=ny,
                       nx=nx, M=int(n_subcycles), interpret=interpret)
    ub_final = bt_out[0:3]
    ubar_avg = bt_out[4:7] / n_subcycles
    Kp = stacked.shape[-1]
    res = jnp.moveaxis(jnp.concatenate([ub_final, ubar_avg]), 0, -1)
    res = jnp.pad(res, ((0, 0), (0, 0), (0, Kp - 6)))[None]

    return _call(stacked, pre, res, consts=consts, kind="splitpost",
                 out_ch=4 + L, **kw)


def split_megastep(mesh, cfg, state, t, dt, n_subcycles=10, bt_drag=0.0,
                   interpret=None):
    """One split-explicit step (== stepping.split.split_forward_backward_
    step) for the supported flagship column-ssh configuration."""
    h, _, tr = state
    stacked = stack_state(mesh, state, parity=False)
    out = split_megastep_stacked(mesh, cfg, stacked, dt, n_subcycles,
                                 bt_drag, interpret=interpret)
    return unstack_state(mesh, out, h.shape[-1], tr.shape[0], type(state))


def rk4_megastep(mesh, cfg, state, t, dt, interpret=None, wind_stress=None):
    """One RK4 step (== stepping.rk4_step with an identity halo) for the
    supported flagship configuration, single-device only."""
    h, _, tr = state
    stacked = stack_state(mesh, state)
    wind = _wind_arg(mesh, cfg, wind_stress, h.dtype)
    out = rk4_megastep_stacked(mesh, cfg, stacked, dt, interpret=interpret,
                               wind=wind)
    return unstack_state(mesh, out, h.shape[-1], tr.shape[0], type(state))
