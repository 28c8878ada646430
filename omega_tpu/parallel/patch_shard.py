"""Multi-device execution of the patch-structured sphere fast path.

The 10 rhombus patches of the icosahedral frame layout (mesh/
icos_patches.py) shard over a 1-D jax device mesh with nshards in
{2, 5, 10}: each device holds whole patches (with their in-frame halo
margins), runs the fused FB patch kernel (ops/patch_megastep.py) on its
own patches, and the per-step in-frame halo refresh decomposes into

  - LOCAL refills (source and target patch on the same device),
  - ppermute rings per device distance for the cross-patch copies
    (static exchange lists exactly like Halo::generateExchangeLists,
    base/Halo.cpp:455-600 — here derived from the fixed patch
    adjacency instead of a graph partition),
  - a REPLICATED pole-fix substep: every device psum-gathers the tiny
    (~hundreds of rows) submesh state and computes the identical fix,

so one step is one kernel + one round of ICI permutes + a replicated
O(1) substep.  Results match the single-device framed path
(ops/patch_megastep.fb_patch_megastep_framed) to roundoff: the kernel
output and the refresh copies are bit-identical; only the replicated
pole-fix substep, recompiled in the shard_map context, may differ by
an ulp where XLA fuses differently.

All scatters in the sharded refresh pad their per-device index lists
with OUT-OF-BOUNDS positions and use mode="drop", so devices with
different list lengths run one common program.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omega_tpu.core.config import ModelConfig
from omega_tpu.core.state import ModelState
from omega_tpu.ops import patch_megastep as pm


class PatchShardPlan:
    """Host-side per-(mesh, nshards) exchange plan (static)."""


_PLANS: Dict[tuple, PatchShardPlan] = {}


def _split_flat(idx: np.ndarray, cell: int, N: int):
    """Global frame-flat index ((t*10 + r)*SS + y)*SS + x ->
    (device, local flat with P = 10/N patches per device)."""
    P_ = 10 // N
    q, rem = np.divmod(idx, cell)
    t, r = np.divmod(q, 10)
    d, rp = np.divmod(r, P_)
    return d, (t * P_ + rp) * cell + rem


def _stack_pad(lists, pad_val, dtype=np.int32):
    """Per-device variable-length lists -> (N, max) array padded."""
    n = max((len(v) for v in lists), default=0)
    out = np.full((len(lists), max(n, 1)), pad_val, dtype)
    for d, v in enumerate(lists):
        out[d, :len(v)] = v
    return out


def build_patch_shard(mesh, nshards: int, dtype) -> PatchShardPlan:
    """Split the framed-step refresh maps of ops/patch_megastep._prep
    into per-device local + per-distance ppermute exchange lists."""
    if nshards not in (2, 5, 10):
        raise ValueError(f"patch sharding needs nshards in (2, 5, 10), "
                         f"got {nshards}")
    key = (mesh.patch_key, nshards, np.dtype(dtype).str)
    if key in _PLANS:
        return _PLANS[key]
    p = pm._prep(mesh, dtype)
    N = nshards
    pl_ = PatchShardPlan()
    pl_.p = p
    pl_.N = N
    pl_.P = 10 // N
    cell = p.SS * p.SS

    pl_.groups = {}
    for grp, T in (("cell", 1), ("edge", 3)):
        m = p.persist[grp]
        size_l = T * pl_.P * cell          # local flat size (per device)
        oob = size_l                       # mode="drop" sentinel

        pos = np.asarray(m["refill_pos"])
        src = np.asarray(m["refill_src"])
        d_p, lp = _split_flat(pos, cell, N)
        d_s, ls = _split_flat(src, cell, N)

        same = d_p == d_s
        loc_p = [lp[same & (d_p == d)] for d in range(N)]
        loc_s = [ls[same & (d_p == d)] for d in range(N)]

        # cross-device: distance rings, wire order = receiver's order
        rings = []
        for dd in range(1, N):
            sel = ~same & (((d_p - d_s) % N) == dd)
            if not sel.any():
                continue
            send = [[] for _ in range(N)]
            recv = [[] for _ in range(N)]
            for d in range(N):              # d = receiver
                mask = sel & (d_p == d)
                send[(d - dd) % N] = ls[mask]
                recv[d] = lp[mask]
            rings.append((dd,
                          _stack_pad(send, 0),
                          _stack_pad(recv, oob)))

        fixp = np.asarray(m["fix_pos"])
        fixr = np.asarray(m["fix_row"])
        d_f, lf = _split_flat(fixp, cell, N) if fixp.size else (
            np.zeros(0, np.int64), np.zeros(0, np.int64))
        zp = np.asarray(m["zero_pos"])
        d_z, lz = _split_flat(zp, cell, N) if zp.size else (
            np.zeros(0, np.int64), np.zeros(0, np.int64))

        pl_.groups[grp] = dict(
            size_l=size_l,
            refill_pos=jnp.asarray(_stack_pad(loc_p, oob)),
            refill_src=jnp.asarray(_stack_pad(loc_s, 0)),
            rings=[(dd, jnp.asarray(s), jnp.asarray(r))
                   for dd, s, r in rings],
            fix_pos=jnp.asarray(_stack_pad(
                [lf[d_f == d] for d in range(N)], oob)),
            fix_row=jnp.asarray(_stack_pad(
                [fixr[d_f == d] for d in range(N)], 0)),
            zero_pos=jnp.asarray(_stack_pad(
                [lz[d_z == d] for d in range(N)], oob)),
        )

    # submesh gathers: per-device masked local sources + psum
    for nm, grp in (("sub_cell", "cell"), ("sub_edge", "edge")):
        src = np.asarray(getattr(p, f"{nm}_src"))
        d_s, ls = _split_flat(src, cell, N)
        own = np.stack([d_s == d for d in range(N)])           # (N, nsub)
        loc = np.where(own, np.stack([ls] * N), 0)
        setattr(pl_, f"{nm}_src_l", jnp.asarray(loc.astype(np.int32)))
        setattr(pl_, f"{nm}_own", jnp.asarray(own))

    # per-device planes / block classes (blocks are patch-major)
    nt2 = p.nt[0] * p.nt[1]
    pl_.planes_l = jnp.asarray(np.asarray(p.planes).reshape(
        (N, pl_.P) + np.asarray(p.planes).shape[1:]))
    pl_.block_class_l = jnp.asarray(
        np.asarray(p.block_class).reshape(N, pl_.P * nt2))
    _PLANS[key] = pl_
    return pl_


def _refresh_sharded(flat, g, fix_rows, axis, N):
    """The sharded counterpart of the framed-step refresh: local refill,
    cross-device ppermute rings, fix scatter, hole re-zero.  The (N, n)
    index tables are closed over (replicated into every shard), so each
    device selects ITS row by axis index — closures do not get split the
    way shard_map operands do."""
    me = jax.lax.axis_index(axis)
    flat = flat.at[g["refill_pos"][me]].set(
        flat[g["refill_src"][me]], mode="drop")
    for dd, send, recv in g["rings"]:
        rows = flat[send[me]]
        rows = jax.lax.ppermute(
            rows, axis, [(s, (s + dd) % N) for s in range(N)])
        flat = flat.at[recv[me]].set(rows, mode="drop")
    if g["fix_pos"].shape[-1]:
        flat = flat.at[g["fix_pos"][me]].set(
            fix_rows[g["fix_row"][me]], mode="drop")
    flat = flat.at[g["zero_pos"][me]].set(0.0, mode="drop")
    return flat


def make_patch_sharded_run(mesh, cfg: ModelConfig, nshards: int,
                           devices=None, interpret=None) -> Callable:
    """run(state, t0, dt, nsteps) -> state over an nshards-device mesh.

    The whole nsteps scan executes inside one shard_map; the frames
    carry stays sharded on device across steps (the analogue of the
    reference keeping halos device-resident between MPI exchanges)."""
    if devices is None:
        devices = jax.devices()[:nshards]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dmesh = Mesh(np.asarray(devices), ("dev",))
    N = nshards

    def run(state: ModelState, t0, dt, nsteps: int,
            wind_stress=None) -> ModelState:
        h, _, tr = state
        K, L = h.shape[-1], tr.shape[0]
        dtype = h.dtype
        plan = build_patch_shard(mesh, nshards, dtype)
        p = plan.p
        frames, fix = pm.stack_frames(mesh, cfg, state)
        Kp = frames.shape[-1]
        frames = jax.device_put(
            frames, NamedSharding(dmesh, P(None, "dev")))
        repl = NamedSharding(dmesh, P())
        fix = jax.device_put(fix, repl)
        # wind planes: the reserved const lanes filled per segment, then
        # split per device exactly like plan.planes_l; the submesh slice
        # rides replicated into the pole-fix substep
        wb = pm.make_wind(mesh, cfg, wind_stress, dtype)
        if wb is None:
            planes_l, wsub = plan.planes_l, None
        else:
            pshape = np.asarray(plan.planes_l).shape
            planes_l = jax.device_put(
                wb[0].reshape(pshape), NamedSharding(dmesh, P("dev")))
            wsub = jax.device_put(wb[1], repl)

        from omega_tpu.ops.megastep import _vmix_on
        tc = cfg.tendencies
        vm = cfg.vert_mix
        vmix = _vmix_on(cfg)
        pp_params, pp_idx = None, None
        if vmix and vm.scheme == "pp81":
            pp_params = (vm.nu0, vm.alpha, vm.n_exp, vm.eos_alpha_t,
                         vm.eos_beta_s, vm.kappa_tracer,
                         vm.kappa_momentum)
            pp_idx = (vm.temp_index, vm.salt_index)
        consts = (float(dt), cfg.gravity, tc.visc_del2, tc.visc_del4,
                  tc.div_factor, tc.eddy_diff2, tc.eddy_diff4,
                  cfg.nvertlayers, tc.density0,
                  tc.bottom_drag_coeff if tc.bottom_drag else 0.0,
                  vm.kappa_tracer if vmix else None,
                  vm.kappa_momentum if vmix else None,
                  pp_params)
        phys = (wb is not None,
                bool(tc.bottom_drag and tc.bottom_drag_coeff != 0.0),
                vmix,
                cfg.flux_thickness_type == "upwind",
                cfg.flux_tracer_type == "upwind",
                pp_idx)

        gc, ge = plan.groups["cell"], plan.groups["edge"]
        in_specs = (P(None, "dev"),) + (P("dev"),) * 6 + (P(),)
        # operand order: frames, planes, block_class, sub src/own x2, fix
        from omega_tpu.stepping.steppers import forward_backward_step

        @functools.partial(
            jax.shard_map, mesh=dmesh,
            in_specs=in_specs, out_specs=(P(None, "dev"), P()),
            check_vma=False)
        def run_sharded(frames_l, planes_l, bc_l, cs_l, co_l, es_l, eo_l,
                        fix0):
            def step(carry, _):
                fr, fx, t = carry
                out = pm._call(
                    fr, planes_l[0], bc_l.reshape(-1),
                    class_lists=pm._hashable(p.class_lists),
                    const_idx=pm._hashable(p.const_idx),
                    consts=consts, L=L, S=p.S, SS=p.SS, by=p.by,
                    nt=p.nt, interpret=interpret, phys=phys)

                # replicated pole-fix substep from the refreshed frames
                cflat = fr[0].reshape(-1, Kp)
                eflat = fr[1:4].reshape(-1, Kp)

                def gath(flat, src, own):
                    v = jnp.where(own[0][:, None], flat[src[0]], 0.0)
                    return jax.lax.psum(v, "dev")[..., :K]

                h_sub = gath(cflat, cs_l, co_l).at[
                    p.fix_cells_local].set(fx["h"])
                u_sub = gath(eflat, es_l, eo_l).at[
                    p.fix_edges_local].set(fx["u"])
                tr_sub = jnp.stack([
                    gath(fr[4 + l].reshape(-1, Kp), cs_l, co_l)
                    for l in range(L)]).at[:, p.fix_cells_local].set(
                        fx["tr"])
                sub_out = forward_backward_step(
                    p.sub_mesh, cfg,
                    ModelState(h=h_sub, u=u_sub, tracers=tr_sub), t, dt,
                    wind_stress=wsub)
                nfx = dict(h=sub_out.h[p.fix_cells_local],
                           u=sub_out.u[p.fix_edges_local],
                           tr=sub_out.tracers[:, p.fix_cells_local])

                nf = fr.at[:, :, pm.FR:pm.FR + p.S,
                           pm.FR:pm.FR + p.S].set(out)

                def pad_rows(rows):
                    if Kp == K:
                        return rows
                    return jnp.pad(rows, ((0, 0), (0, Kp - K)))

                sh1 = nf[0].shape
                nf = nf.at[0].set(_refresh_sharded(
                    nf[0].reshape(-1, Kp), gc, pad_rows(nfx["h"]),
                    "dev", N).reshape(sh1))
                nf = nf.at[1:4].set(_refresh_sharded(
                    nf[1:4].reshape(-1, Kp), ge, pad_rows(nfx["u"]),
                    "dev", N).reshape(nf[1:4].shape))
                for l in range(L):
                    nf = nf.at[4 + l].set(_refresh_sharded(
                        nf[4 + l].reshape(-1, Kp), gc,
                        pad_rows(nfx["tr"][l]), "dev", N).reshape(sh1))
                return (nf, nfx, t + dt), None

            (fr, fx, _), _ = jax.lax.scan(
                step, (frames_l, fix0, jnp.asarray(t0, dtype)), None,
                length=nsteps)
            return fr, fx

        frames, fix = jax.jit(run_sharded)(
            frames, planes_l, plan.block_class_l,
            plan.sub_cell_src_l, plan.sub_cell_own,
            plan.sub_edge_src_l, plan.sub_edge_own, fix)
        frames = jax.device_get(frames)
        return pm.unstack_frames(mesh, (jnp.asarray(frames), fix), K, L,
                                 type(state))

    return run
