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
  * fields keep the native (..., N, K) layout; the (T, ny, nx, K) grid
    view is a free reshape; K sits on lanes (padded to 128)
  * the periodic wrap is materialized once per step per field by
    padding R rows/columns (one copy), not once per stencil
  * inside the kernel every structured-table stencil becomes static
    shifted rolls of the tile slab (garbage creeps in from the slab
    edge by one ring per application; the owned center stays valid
    because the total chain radius < R)
  * the hex lattice's parity-staggered column shifts are a row-parity
    select, with the global row index reconstructed from the tile id
  * supported configuration = the flagship FB step (structured f-plane
    mesh with uniform geometry, center fluxes, stacked ssh, pv/ke/ssh
    del2/del4 + tracer adv/del2/del4, no vmix/wind/drag); anything
    else falls back to the composed stepper (steppers.py)

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

# slab halo ring; the longest chain is exactly 6 columns
# (cmean+div+kite+vmean = 4, then tang's +-2) and 5 rows.
# Measured on v5e at 256^2 x 100: (R=8, tile 16) 6.8 ms beats
# (R=6, tile 16) 7.3 and (R=6, tile 24) 7.4; tile 32 OOMs VMEM.
R = int(os.environ.get("OMEGA_MEGA_R", 8))


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


def supported(mesh, cfg) -> bool:
    """The flagship configuration this kernel implements."""
    tc = cfg.tendencies
    if not structured.enabled(mesh):
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
    return (cfg.flux_thickness_type == "center"
            and cfg.flux_tracer_type == "center"
            and cfg.ssh_formulation == "stacked"
            and not cfg.vert_mix.enabled
            and tc.thickness_flux_div and tc.pv_advection and tc.ke_gradient
            and tc.ssh_gradient and tc.velocity_diffusion
            and tc.velocity_hyperdiff and tc.tracer_horz_adv
            and tc.tracer_diffusion and tc.tracer_hyperdiff
            and not tc.wind_forcing and not tc.bottom_drag
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
    """
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


def _kernel(h_hbm, u_hbm, tr_hbm, hn_hbm, un_hbm, trn_hbm, *,
            tabs, consts, L, ny, nx, K, by, bx, nby, nbx):
    """Slab-resident FB step. Inputs are wrap-padded (ch, ny+2R, nx+2R, K);
    outputs are (ch, ny, nx, K)."""
    (dt, grav, nu2, nu4, div_factor, ed2, ed4, inv_dc, inv_dv, inv_dv_floor,
     geo, f0v, scal2, scal4) = consts
    YY, XX = by + 2 * R, bx + 2 * R

    def body(h_s, u_s, tr_s, hn_s, un_s, trn_s, sem):
        nblocks = nby * nbx
        cp = pltpu.make_async_copy

        def in_dmas(slot, bidx):
            biy = bidx // nbx
            bix = bidx % nbx
            y0 = biy * by          # offset into the PADDED input
            x0 = bix * bx
            return (cp(h_hbm.at[:, pl.ds(y0, YY), pl.ds(x0, XX)],
                       h_s.at[slot], sem.at[3 * slot + 0]),
                    cp(u_hbm.at[:, pl.ds(y0, YY), pl.ds(x0, XX)],
                       u_s.at[slot], sem.at[3 * slot + 1]),
                    cp(tr_hbm.at[:, pl.ds(y0, YY), pl.ds(x0, XX)],
                       tr_s.at[slot], sem.at[3 * slot + 2]))

        def out_dmas(slot, bidx):
            biy = bidx // nbx
            bix = bidx % nbx
            ys = pl.ds(biy * by, by)
            xs = pl.ds(bix * bx, bx)
            return (cp(hn_s.at[slot], hn_hbm.at[:, ys, xs],
                       sem.at[6 + 3 * slot + 0]),
                    cp(un_s.at[slot], un_hbm.at[:, ys, xs],
                       sem.at[6 + 3 * slot + 1]),
                    cp(trn_s.at[slot], trn_hbm.at[:, ys, xs],
                       sem.at[6 + 3 * slot + 2]))

        for d in in_dmas(0, 0):
            d.start()

        def loop(bidx, _):
            cur = bidx % 2
            nxt = (bidx + 1) % 2
            biy = bidx // nbx

            @pl.when(bidx + 1 < nblocks)
            def _():
                for d in in_dmas(nxt, bidx + 1):
                    d.start()

            for d in in_dmas(cur, bidx):
                d.wait()

            # destination-row parity: global row of slab row iy is
            # biy*by - R + iy (mod ny); ny is even so parity is exact
            row = (biy * by - R) + jax.lax.broadcasted_iota(
                jnp.int32, (YY, XX, K), 0)
            even = (row % 2) == 0

            h = h_s[cur, 0]
            u = [u_s[cur, i] for i in range(3)]
            tr = [tr_s[cur, i] for i in range(L)]

            ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)

            # --- thickness
            mean_h = ap("cmean", [h], 3)
            flux = [mean_h[i] * u[i] for i in range(3)]
            dh = ap("div", flux, 1)[0]
            h_new = h + dt * (-dh)

            # --- tracers (center flux + del2 + del4)
            trn = []
            for l in range(L):
                htr = ap("cmean", [h * tr[l]], 3)
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

            mean_hn = ap("cmean", [h_new], 3)
            F = [mean_hn[i] * u[i] for i in range(3)]
            tf = ap("tang", F, 3)
            tfq = ap("tang", [F[i] * q_e[i] for i in range(3)], 3)
            pv = [0.5 * (q_e[i] * tf[i] + tfq[i]) for i in range(3)]

            gke = ap("cdiff", [ke], 3)
            gssh = ap("cdiff", [h_new], 3)       # stacked ssh, uniform depth
            cd4 = ap("cdiff", [del2_div], 3)
            vd4 = ap("vdiff", del2_rv, 3)

            # the du diff terms use plain 1/dv (TendencyTerms), while
            # del2_e above used the dv >= 0.25 dc floor (Del2AuxVars)
            un = []
            for i in range(3):
                du = (pv[i]
                      - gke[i] * inv_dc
                      - grav * gssh[i] * inv_dc
                      + nu2 * scal2 * (cdd[i] * inv_dc - vdr[i] * inv_dv)
                      - nu4 * scal4 * (div_factor * cd4[i] * inv_dc
                                       - vd4[i] * inv_dv))
                un.append(u[i] + dt * du)

            # --- write owned centers (wait for this slot's previous
            # write to drain before overwriting)
            @pl.when(bidx >= 2)
            def _():
                for d in out_dmas(cur, bidx - 2):
                    d.wait()

            c = slice(R, R + by)
            cx = slice(R, R + bx)
            hn_s[cur, 0] = h_new[c, cx]
            for i in range(3):
                un_s[cur, i] = un[i][c, cx]
            for l in range(L):
                trn_s[cur, l] = trn[l][c, cx]

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
        h_s=pltpu.VMEM((2, 1, YY, XX, K), h_hbm.dtype),
        u_s=pltpu.VMEM((2, 3, YY, XX, K), h_hbm.dtype),
        tr_s=pltpu.VMEM((2, L, YY, XX, K), h_hbm.dtype),
        hn_s=pltpu.VMEM((2, 1, by, bx, K), h_hbm.dtype),
        un_s=pltpu.VMEM((2, 3, by, bx, K), h_hbm.dtype),
        trn_s=pltpu.VMEM((2, L, by, bx, K), h_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((12,)),
    )


def _pick_tile(ny, nx):
    """Largest (by, bx) tile dividing (ny, nx) under a VMEM-driven cap
    (OMEGA_MEGA_TILE accepts '16' or '16x32' for rectangular tiles)."""
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
    "tabs", "consts", "L", "ny", "nx", "interpret"))
def _call(hp, up, trp, *, tabs, consts, L, ny, nx, interpret):
    K = hp.shape[-1]
    by, bx = _pick_tile(ny, nx)
    kern = functools.partial(_kernel, tabs=dict(tabs), consts=consts, L=L,
                             ny=ny, nx=nx, K=K, by=by, bx=bx,
                             nby=ny // by, nbx=nx // bx)
    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((1, ny, nx, K), hp.dtype),
                   jax.ShapeDtypeStruct((3, ny, nx, K), hp.dtype),
                   jax.ShapeDtypeStruct((L, ny, nx, K), hp.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),) * 3,
        interpret=interpret,
    )(hp, up, trp)


def _wrap_pad(g, ny, nx):
    """Pad R rows and R columns with the periodic wrap + lane-align K."""
    g = jnp.concatenate([g[:, ny - R:], g, g[:, :R]], axis=1)
    g = jnp.concatenate([g[:, :, nx - R:], g, g[:, :, :R]], axis=2)
    K = g.shape[-1]
    Kp = -(-K // 128) * 128
    if Kp != K:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))
    return g


def fb_megastep(mesh, cfg, state, t, dt, interpret=None):
    """One forward-backward step (== stepping.forward_backward_step) for
    the supported flagship configuration."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tc = cfg.tendencies
    nx, ny = mesh.structured_nx, mesh.structured_ny
    us = lambda a: structured.uniform_scalar(mesh, a)
    dc, dv = us("dc_edge"), us("dv_edge")
    inv_dv_floor = 1.0 / max(dv, 0.25 * dc)
    consts = (float(dt), cfg.gravity, tc.visc_del2, tc.visc_del4,
              tc.div_factor, tc.eddy_diff2, tc.eddy_diff4,
              1.0 / dc, 1.0 / dv, inv_dv_floor,
              dv / dc,                       # geo (edge_mask == 1)
              us("f_vertex"),
              us("mesh_scaling_del2"), us("mesh_scaling_del4"))
    names = ("div", "ke", "curl", "kite", "tang", "cdiff", "cmean",
             "vdiff", "vmean", "signed_div")
    tabs = tuple((n, _table(mesh, n)) for n in names)

    h, u, tr = state
    K = h.shape[-1]
    L = tr.shape[0]
    hp = _wrap_pad(h.reshape(1, ny, nx, K), ny, nx)
    up = _wrap_pad(u.reshape(3, ny, nx, K), ny, nx)
    trp = _wrap_pad(tr.reshape(L, ny, nx, K), ny, nx)

    hn, un, trn = _call(hp, up, trp, tabs=tabs, consts=consts,
                        L=L, ny=ny, nx=nx, interpret=interpret)
    if hn.shape[-1] != K:
        hn, un, trn = hn[..., :K], un[..., :K], trn[..., :K]
    return state._replace(h=hn.reshape(ny * nx, K),
                          u=un.reshape(3 * ny * nx, K),
                          tracers=trn.reshape(L, ny * nx, K))
