"""The whole forward-backward step as ONE Pallas kernel on the SPHERE.

Sphere counterpart of ops/megastep.py: icosahedral meshes renumbered by
mesh/icos_patches.py run the full FB chain per (patch, tile) slab using
the padded-domain tables of mesh/icos_mega.py — per-position weight
PLANES instead of the planar path's uniform scalars, plain 2-D shifts
instead of parity selects (the rhombus lattice is unstaggered), and NO
mid-chain fix-ups: rotated seam stencils are extra low-support entries,
and the only rows the lattice cannot serve (the 2 pole cells, a handful
of pole-adjacent edges — constant count at any resolution) are
recomputed on a ~300-cell extracted submesh by the composed stepper and
scattered over the kernel result.

Execution model per step:
  1. paste + one fill gather/scatter builds halo-MH state frames
     (CH, 10, SS, SS, K128), SS = S + 2R so edge tiles' slabs stay in
     bounds (the outer ring is zeros, never read by valid stencils)
  2. the kernel tiles the S x S frame into (by, by) blocks; each block
     reads a radius-R slab of state + weight planes, evaluates the
     entire chain in VMEM, writes its block of the output frames
  3. paste-back: a reshape covers the natural grid rows; seam orphans,
     cross-seam duplicates and tails come from any exact frame position
     (icos_mega validity masks, which model the tile slab creep
     exactly); dead rows zero; fix rows from the submesh step

Divisions guard against lattice-hole zeros (safe_div) because 0/0 NaN
at a hole would otherwise poison valid sums through 0 * NaN entries.

Semantics == stepping.forward_backward_step on the flagship sphere
configuration; reference chain per core/tendencies.py / core/aux.py
(TendencyTerms.h:70-340, AuxiliaryState.cpp:60-143).
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omega_tpu.mesh import icos_mega as imx
from omega_tpu.mesh.icos_mega import MH, NPER, fb_chain, chain_class

R = MH           # kernel slab halo ring == frame halo
FR = R           # extra zero ring so edge-tile slabs stay in bounds


def enabled() -> bool:
    v = os.environ.get("OMEGA_PATCH_MEGA")
    if v is not None:
        return v in ("1", "true")
    return jax.default_backend() == "tpu"


def supported(mesh, cfg, kind="fb", framed=False) -> bool:
    """Flagship sphere configuration (mirrors megastep.supported).

    Round 4: wind forcing, quadratic bottom drag and constant-
    coefficient implicit vertical mixing run INSIDE the chain (wind
    planes in reserved const lanes, lane-axis PCR after the horizontal
    chain), so Omega-1 science configs stay on the fused path.

    Land (edge_mask == 0 on real edges, built by
    mesh/icos_patches.apply_land_mask) is supported: the chain carries
    the mask gates of the composed path (tracer-flux mask*u, the
    del2_e grad-part mask, the accumulated-du gate), and on land-free
    meshes the mask collapses to the scalar 1.0 so those gates are
    free aliases."""
    tc = cfg.tendencies
    if getattr(mesh, "patch_key", 0) == 0:
        return False
    from omega_tpu.ops import patch_stencil
    if not patch_stencil.enabled(mesh):
        return False
    from omega_tpu.ops.megastep import _vmix_on
    if cfg.vert_mix.enabled and not _vmix_on(cfg):
        return False        # the Thomas method stays composed
    if _vmix_on(cfg) and (MH < 7 or os.environ.get(
            "OMEGA_PATCH_PHYS_MASKS", "1") != "1"):
        return False        # the radius-7 vmix chain needs the full
        # margin AND worst-case validity masks (see icos_mega._build)
    if (_vmix_on(cfg) and cfg.vert_mix.scheme == "pp81"
            and os.environ.get("OMEGA_PATCH_PP81", "0") != "1"
            and not (framed and kind == "fb"
                     and os.environ.get("OMEGA_PATCH_FB2") != "0")):
        # single-kernel PP81 pushes the Mosaic scoped stack to ~164M >
        # the 128M VMEM at the icos48 defaults, but the framed FB path
        # auto-routes PP81 through the staged two-kernel FB (vmix tail
        # in stage B's half-size body: fits, 32.02 ms/step measured at
        # icos48).  Elsewhere (RK chains, non-framed single steps) the
        # composed stepper carries PP81 unless OMEGA_PATCH_PP81=1
        # opts in (e.g. at smaller tiles).
        return False
    # FCT (Zalesak) tracer fluxes: the limiter chain's radius (10) needs
    # the two-stage fct_patch_megastep_framed driver (persistent frames
    # only), the FB thickness-first update order, and no fused vmix
    tracer_types = ("center", "upwind")
    if kind == "fb" and framed and not cfg.vert_mix.enabled:
        tracer_types = tracer_types + ("fct",)
    return (cfg.flux_thickness_type in ("center", "upwind")
            and cfg.flux_tracer_type in tracer_types
            and cfg.ssh_formulation == "stacked"
            and tc.thickness_flux_div and tc.pv_advection and tc.ke_gradient
            and tc.ssh_gradient and tc.velocity_diffusion
            and tc.velocity_hyperdiff and tc.tracer_horz_adv
            and tc.tracer_diffusion and tc.tracer_hyperdiff
            and not tc.use_custom_tendency)


# ----------------------------------------------------------------------
# prep (host side, cached per mesh/dtype)

class _Prep:
    pass


_PREP: Dict[tuple, _Prep] = {}


def _block_classes(p, pstack_sup):
    """Cluster kernel blocks by which entries have support in their slab.

    Returns (block_class int32 (nblocks,), class_lists) where
    class_lists[c] mirrors p.entry_lists filtered to the union of the
    class's blocks' live entries.  Greedy merge from the distinct
    per-block sets, minimizing sum_b |union(class(b))|."""
    (byy, byx), (nty, ntx) = p.by, p.nt
    YY, XX = byy + 2 * R, byx + 2 * R
    sup = np.pad(np.stack(pstack_sup),
                 ((0, 0), (0, 0), (FR, FR), (FR, FR)))   # (NE, 10, SS, SS)
    live = []
    for r in range(10):
        for ty in range(nty):
            for tx in range(ntx):
                live.append(sup[:, r, ty * byy:ty * byy + YY,
                                tx * byx:tx * byx + XX].any(axis=(1, 2)))
    live = np.array(live)                                # (nblocks, NE)
    k = max(1, int(os.environ.get("OMEGA_PATCH_K", "4")))
    groups: Dict[bytes, list] = {}
    for b in range(len(live)):
        groups.setdefault(live[b].tobytes(), [live[b].copy(), []])[1].append(b)
    cl = list(groups.values())
    while len(cl) > k:
        best = None
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                u = cl[i][0] | cl[j][0]
                d = (int(u.sum()) * (len(cl[i][1]) + len(cl[j][1]))
                     - int(cl[i][0].sum()) * len(cl[i][1])
                     - int(cl[j][0].sum()) * len(cl[j][1]))
                if best is None or d < best[0]:
                    best = (d, i, j, u)
        _, i, j, u = best
        cl[i] = [u, cl[i][1] + cl[j][1]]
        cl.pop(j)
    block_class = np.zeros(len(live), np.int32)
    class_lists = []
    for ci, (mask, blocks_) in enumerate(cl):
        block_class[blocks_] = ci
        lists = {}
        for name, (Td, Ts, lst) in p.entry_lists.items():
            lists[name] = (Td, Ts, tuple(e for e in lst if mask[e[4]]))
        class_lists.append(lists)
    return jnp.asarray(block_class), tuple(class_lists)


def attach_planes(mesh, dtype, fct=False):
    """Return a mesh copy whose `patch_planes` LEAF carries the kernel's
    lane-major weight-plane stack, so callers that pass the mesh as a
    jit ARGUMENT move the stack out of the program and into a runtime
    operand.  Embedded as an HLO literal it is 164 MB at icos48 and
    ~530 MB at icos96 — past the axon remote-compile body limit (the
    round-4 HTTP 413).  Opt-in: the default (closed-over mesh) path is
    bit-identical and unaffected.

    The prep key (env knobs + dtype + layout) rides along as static
    metadata; if the knobs change between attach and use, the kernel
    silently falls back to the constant stack."""
    import dataclasses
    p = _prep(mesh, dtype, fct=fct)
    return dataclasses.replace(mesh, patch_planes=p.planes,
                               patch_planes_key=p.key)


def _planes_of(p, mesh):
    """The kernel's weight-plane stack: the mesh-leaf operand when one
    was attached under the current prep key, else the prep constant."""
    if (mesh is not None and getattr(mesh, "patch_planes", None) is not None
            and getattr(mesh, "patch_planes_key", ()) == p.key):
        return mesh.patch_planes
    return p.planes


def _prep(mesh, dtype, fct=False):
    # env knobs are part of the key so an in-process A/B rebuilds; the
    # compile-time-eval scope keeps every cached jnp array CONCRETE
    # even when the first call happens under a jit trace (a cached
    # tracer would leak into the next jit and fail it).  `fct` adds the
    # Zalesak tables' weight planes to the stack (and their chains'
    # refresh maps); non-FCT preps keep today's layout bit-for-bit.
    key = (mesh.patch_key, np.dtype(dtype).str,
           os.environ.get("OMEGA_PATCH_TILE", "16"),
           os.environ.get("OMEGA_PATCH_K", "4"), MH,
           os.environ.get("OMEGA_PATCH_PHYS_MASKS", "1"), bool(fct))
    if key in _PREP:
        return _PREP[key]
    with jax.ensure_compile_time_eval():
        return _prep_build(mesh, dtype, key, fct=fct)


def _persist_map(p, mesh, mg, grp, keep, fixg):
    """In-frame refresh map for one element class given a validity keep
    mask (T, 10, S, S) and a fix set: (persist dict, src_of).  Shared by
    the standard prep and the FCT extension (whose keeps come from the
    FCT chains' own masks)."""
    n, S = p.n, mg.S
    NG = 10 * n * n
    cont = mg.content[grp]
    T = cont.shape[0]
    ids = cont.reshape(-1)
    keep_f = keep.reshape(-1)
    t_, rem = np.divmod(np.arange(ids.size), 10 * S * S)
    r_, rem = np.divmod(rem, S * S)
    y_, x_ = np.divmod(rem, S)
    ssf = (((t_ * 10 + r_) * p.SS + y_ + FR) * p.SS + x_ + FR)
    natural_id = np.full(cont.shape, -1, np.int64)
    natural_id[:, :, MH:MH + n, MH:MH + n] = \
        np.arange(T * NG, dtype=np.int64).reshape(T, 10, n, n)
    is_nat = ((cont == natural_id) & (natural_id >= 0)).reshape(-1)
    Nel = mesh.ncells if grp == "cell" else mesh.nedges
    src_of = np.full(Nel, -1, np.int64)
    sel = np.flatnonzero(keep_f)
    src_of[ids[sel]] = ssf[sel]          # any valid position...
    sel2 = np.flatnonzero(keep_f & is_nat)
    src_of[ids[sel2]] = ssf[sel2]        # ...natural one preferred
    isfix = np.zeros(Nel, bool)
    isfix[fixg] = True
    refp = np.flatnonzero((ids >= 0) & ~keep_f)
    gref = ids[refp]
    from_fix = isfix[gref]
    # every non-fix refreshed element must be exact SOMEWHERE in the
    # frame — otherwise it belongs in the fix set by construction
    assert (src_of[gref[~from_fix]] >= 0).all(), grp
    persist = dict(
        refill_pos=jnp.asarray(ssf[refp[~from_fix]].astype(np.int32)),
        refill_src=jnp.asarray(
            src_of[gref[~from_fix]].astype(np.int32)),
        fix_pos=jnp.asarray(ssf[refp[from_fix]].astype(np.int32)),
        fix_row=jnp.asarray(
            np.searchsorted(fixg, gref[from_fix]).astype(np.int32)),
        zero_pos=jnp.asarray(
            ssf[np.flatnonzero(ids < 0)].astype(np.int32)))
    # the same chosen positions in KERNEL-OUTPUT coordinates (the
    # content map is S-wide, so the out-frame flat index is the content
    # flat index itself) — used to read kernel outputs that never enter
    # the frames (the split chain's du_out)
    src_out = np.full(Nel, -1, np.int64)
    src_out[ids[sel]] = sel
    src_out[ids[sel2]] = sel2
    return persist, src_of, src_out


def _prep_build(mesh, dtype, key, fct=False):
    mg = imx.ensure_mega(mesh)
    p = _Prep()
    p.key = key
    p.mg = mg
    p.fct = fct
    n, S, by = mg.n, mg.S, mg.by
    if isinstance(by, int):
        by = (by, by)
    p.n, p.S, p.by = n, S, by
    p.SS = S + 2 * FR
    p.nt = (S // by[0], S // by[1])

    # ---- stack all entry planes (padded to SS) + const planes ----
    planes, p.entry_lists = [], {}
    for name, tab in mg.tables.items():
        if not fct and name in imx.FCT_TABLES:
            continue
        lst = []
        for (td, ts, da, db, wpl) in tab.entries:
            lst.append((td, ts, da, db, len(planes)))
            planes.append(wpl)
        p.entry_lists[name] = (NPER[tab.dst_class], NPER[tab.src_class], lst)
    n_entry_planes = len(planes)
    p.const_idx = {}
    for cname, cpl in mg.const_planes.items():
        T = cpl.shape[0]
        flat = cpl.reshape(T, -1)
        # uniformity over LIVE CONTENT slots (not over nonzero values:
        # a zero at a live slot is semantic — a land edge's mask, an
        # equal-depth gdepth — and must not collapse to a scalar)
        cls = {"f_vertex": "vertex", "depth": "cell"}.get(cname, "edge")
        live = (mg.content[cls] >= 0).reshape(T, -1)
        vals = flat[live]
        if not live.any() or not vals.any():
            p.const_idx[cname] = 0.0        # identically zero -> skip
            continue
        if np.allclose(vals, vals[0]):
            p.const_idx[cname] = float(vals[0])   # uniform -> scalar
            continue
        p.const_idx[cname] = (len(planes), T)
        for t in range(T):
            planes.append(cpl[t])
    # reserved wind-stress lanes (3 edge classes), zero until a wind
    # segment fills them at runtime (make_wind) — always present so the
    # lane layout (and the per-class prefix trim) is wind-independent
    p.const_idx["wind_stress"] = (len(planes), 3)
    for _ in range(3):
        planes.append(np.zeros((10, S, S)))
    # ---- block -> entry-class specialization ----
    # Seam-rotated entries have support only near patch borders; a block
    # whose slab never touches an entry's support can skip it exactly
    # (its weight plane is identically zero there, and slabs hold only
    # finite values, so the dropped contribution is an exact 0).  Blocks
    # are clustered into K classes (union entry sets) so the kernel
    # carries K chain instances instead of one per distinct set; each
    # block evaluates its class's list, selected by an SMEM class id.
    # Measured at icos48 (by=16): dense-all = 537 entries/block; K=4
    # classes cut evaluated entries to 0.44x (0.31x is the 26-class
    # floor); by=32 K=4 is 0.51x of its 0.56x-smaller dense base.
    p.block_class, p.class_lists = _block_classes(
        p, pstack_sup=[np.abs(pl_) > 0 for pl_ in planes[:n_entry_planes]])

    # ---- class-ordered lane layout + per-class DMA extents ----
    # Lane extents in DMA slices must be 128-multiples, so per-tile
    # plane copies move a 128-quantized lane PREFIX.  Order the lanes so
    # each class's live planes form as short a prefix as possible:
    # const planes first (every class reads them), then each class's
    # entry planes, classes by descending block count.  A block then
    # DMAs only its class's prefix (class_lanes, used by the kernel
    # under OMEGA_PATCH_LANETRIM).  At icos48 by=16 the interior class
    # (75/160 blocks) needs 256 of the 640 lanes.
    nconst = len(planes) - n_entry_planes
    order = list(range(n_entry_planes, len(planes)))      # consts first
    bc_np = np.asarray(p.block_class)
    used_of = []
    for lists in p.class_lists:
        u = set()
        for name, (Td, Ts, lst) in lists.items():
            u.update(e[4] for e in lst)
        used_of.append(u)
    nblk_of = [int((bc_np == ci).sum()) for ci in range(len(used_of))]
    placed = set()
    for ci in np.argsort([-nb for nb in nblk_of], kind="stable"):
        for e in sorted(used_of[int(ci)]):
            if e not in placed:
                placed.add(e)
                order.append(e)
    for e in range(n_entry_planes):           # planes live in no class
        if e not in placed:
            order.append(e)
    new_of = {old: new for new, old in enumerate(order)}

    def _remap(lists):
        return {name: (Td, Ts, tuple((td, ts, da, db, new_of[i])
                                     for (td, ts, da, db, i) in lst))
                for name, (Td, Ts, lst) in lists.items()}

    p.entry_lists = _remap(p.entry_lists)
    p.class_lists = tuple(_remap(l) for l in p.class_lists)
    # const planes keep their relative order at the front of the stack
    p.const_idx = {k: ((v[0] - n_entry_planes, v[1])
                       if isinstance(v, tuple) else v)
                   for k, v in p.const_idx.items()}
    p.wind_lanes = p.const_idx["wind_stress"][0]
    # every class reads the const planes (indices [0, nconst) after the
    # remap), so an empty entry set still needs the const prefix; entry
    # planes are placed after the consts, so a non-empty max covers it
    p.class_lanes = tuple(
        -(-(max(new_of[e] for e in u) + 1) // 128) * 128 if u
        else -(-max(nconst, 1) // 128) * 128
        for u in used_of)

    # lane-major plane storage: (10, SS, SS, NPLp) with the PLANE INDEX
    # on lanes (padded to a 128-multiple; class-prefix order from above)
    pstack = np.stack([planes[o] for o in order]).astype(dtype)
    pstack = np.pad(pstack, ((0, 0), (0, 0), (FR, FR), (FR, FR)))
    npl = pstack.shape[0]
    nplp = -(-npl // 128) * 128
    lane_major = np.zeros((10, p.SS, p.SS, nplp), dtype)
    lane_major[..., :npl] = np.moveaxis(pstack, 0, -1)
    p.planes = jnp.asarray(lane_major)
    p.npl = nplp

    # ---- fills in SS coords ----
    p.fills = {}
    for cls in ("cell", "edge"):
        pos, src = mg.fills[cls]
        T = NPER[cls]
        t, rem = np.divmod(pos.astype(np.int64), 10 * S * S)
        r, rem = np.divmod(rem, S * S)
        y, x = np.divmod(rem, S)
        pos2 = ((t * 10 + r) * p.SS + y + FR) * p.SS + x + FR
        p.fills[cls] = (jnp.asarray(pos2.astype(np.int32)),
                        jnp.asarray(src))

    # ---- paste-back (rim positions -> full-frame S x S coords) ----
    p.outputs = {}
    no = n + 2 * imx.OH
    for oname, (rim, rpos, dead, fix) in mg.outputs.items():
        t, rem = np.divmod(rpos.astype(np.int64), 10 * no * no)
        r, rem = np.divmod(rem, no * no)
        yo, xo = np.divmod(rem, no)
        rpos_full = (((t * 10 + r) * S + yo + MH - imx.OH) * S
                     + xo + MH - imx.OH).astype(np.int32)
        p.outputs[oname] = (jnp.asarray(rim), jnp.asarray(rpos_full),
                            jnp.asarray(dead), jnp.asarray(fix))

    # ---- fix submesh ----
    p.sub_mesh = mg.sub_mesh.astype(dtype).device_put() \
        if hasattr(mg.sub_mesh, "astype") else mg.sub_mesh
    p.sub_cells = jnp.asarray(mg.sub_cells.astype(np.int32))
    p.sub_edges = jnp.asarray(mg.sub_edges.astype(np.int32))
    p.fix_cells_local = jnp.asarray(mg.fix_cells_local)
    p.fix_cells_global = jnp.asarray(mg.fix_cells_global)
    p.fix_edges_local = jnp.asarray(mg.fix_edges_local)
    p.fix_edges_global = jnp.asarray(mg.fix_edges_global)

    # ---- persistent-frame maps (frames as the scan carry) ----
    # After the kernel, mg.masks says which frame positions are exact;
    # the rest refresh by copying from a valid position of the same
    # element (the in-frame halo fill), pole/defect elements come from
    # the fix submesh, and lattice holes re-zero (creep garbage there is
    # multiplied by zero weights but must stay finite across steps).
    p.persist = {}
    src_of_np = {}
    for grp, mask_keys in (("cell", ("h_new", "trn0")),
                           ("edge", ("u_new",))):
        cont = mg.content[grp]
        keep = cont >= 0
        for k_ in mask_keys:
            keep = keep & mg.masks[k_]
        fixg = mg.fix_cells_global if grp == "cell" else mg.fix_edges_global
        p.persist[grp], src_of, src_out = _persist_map(p, mesh, mg, grp,
                                                       keep, fixg)
        src_of_np[grp] = src_of
        src_of_np[grp + "_out"] = src_out
    # sub-state gathers (fix rows overwritten from the carried fix_vals)
    p.sub_cell_src = jnp.asarray(
        np.maximum(src_of_np["cell"][mg.sub_cells], 0).astype(np.int32))
    p.sub_edge_src = jnp.asarray(
        np.maximum(src_of_np["edge"][mg.sub_edges], 0).astype(np.int32))
    # final read-out maps (refreshed frames hold every element somewhere)
    p.cell_src = jnp.asarray(
        np.maximum(src_of_np["cell"], 0).astype(np.int32))
    p.cell_src_ok = jnp.asarray(src_of_np["cell"] >= 0)
    p.edge_src = jnp.asarray(
        np.maximum(src_of_np["edge"], 0).astype(np.int32))
    p.edge_src_ok = jnp.asarray(src_of_np["edge"] >= 0)
    p.edge_src_out = jnp.asarray(
        np.maximum(src_of_np["edge_out"], 0).astype(np.int32))

    # ---- FCT extension: refresh maps + fix submesh from the Zalesak
    # chains' own validity (mesh/icos_mega.ensure_fct) ----
    if fct:
        fi = imx.ensure_fct(mesh)
        p.fct_persist = {}
        fsrc = {}
        for grp, keep_key, fixg in (
                ("cell", "cell_keep", fi["fix_cells_global"]),
                ("edge", "edge_keep", fi["fix_edges_global"])):
            keep = (mg.content[grp] >= 0) & fi[keep_key]
            p.fct_persist[grp], fsrc[grp], _ = _persist_map(
                p, mesh, mg, grp, keep, fixg)
        p.fct_sub_mesh = fi["sub_mesh"].astype(dtype).device_put() \
            if hasattr(fi["sub_mesh"], "astype") else fi["sub_mesh"]
        p.fct_sub_cells = jnp.asarray(fi["sub_cells"].astype(np.int32))
        p.fct_fix_cells_local = jnp.asarray(fi["fix_cells_local"])
        p.fct_fix_cells_global = jnp.asarray(fi["fix_cells_global"])
        p.fct_fix_edges_local = jnp.asarray(fi["fix_edges_local"])
        p.fct_fix_edges_global = jnp.asarray(fi["fix_edges_global"])
        p.fct_sub_cell_src = jnp.asarray(np.maximum(
            fsrc["cell"][fi["sub_cells"]], 0).astype(np.int32))
        p.fct_sub_edge_src = jnp.asarray(np.maximum(
            fsrc["edge"][fi["sub_edges"]], 0).astype(np.int32))
        # final read-out maps on the FCT validity (unstack_frames)
        p.fct_cell_src = jnp.asarray(
            np.maximum(fsrc["cell"], 0).astype(np.int32))
        p.fct_cell_src_ok = jnp.asarray(fsrc["cell"] >= 0)
        p.fct_edge_src = jnp.asarray(
            np.maximum(fsrc["edge"], 0).astype(np.int32))
        p.fct_edge_src_ok = jnp.asarray(fsrc["edge"] >= 0)

    _PREP[key] = p
    return p


# ----------------------------------------------------------------------
# chain evaluation on slabs (shared by kernel; planes via `pget`)

def _roll(s, d, axis):
    """out[i] = s[i + d] (slice+concat; wraps slab garbage — creep)."""
    if d == 0:
        return s
    nn = s.shape[axis]
    d = d % nn
    lo = [slice(None)] * s.ndim
    hi = [slice(None)] * s.ndim
    lo[axis] = slice(d, None)
    hi[axis] = slice(0, d)
    return jnp.concatenate([s[tuple(lo)], s[tuple(hi)]], axis=axis)


def _safe_div(a, b):
    return jnp.where(b != 0, a / jnp.where(b != 0, b, 1), 0)


def _op_inputs(op):
    """Chain-value names an op reads (excluding $const planes)."""
    args = [op[3]] if op[1] == "st" else list(op[3:])
    return [a for a in args if isinstance(a, str) and not a.startswith("$")]


def _last_use(ops, outputs):
    """Op index after which each chain value is dead (outputs live to
    the end). Keyed by NAME: a reassignment ('du') extends its life."""
    last = {}
    for i, op in enumerate(ops):
        for nm in _op_inputs(op):
            last[nm] = i
    for nm in outputs:
        last[nm] = len(ops)
    return last


def yshrink_enabled() -> bool:
    return os.environ.get("OMEGA_PATCH_YSHRINK", "1") in ("1", "true")


def pool_enabled() -> bool:
    """OMEGA_PATCH_POOL=1: explicit cross-op VMEM buffer reuse.

    LONG-LIVED chain values (lifetime > OMEGA_PATCH_POOL_T ops) are
    stored into a fixed pool of (YY, XX, K) scratch slabs with
    host-side linear-scan slot allocation (freed slots reuse
    immediately), instead of living as anonymous Mosaic stack values;
    short-lived values stay inline SSA and keep the Y-extent shrink.
    This targets the live ranges that blow up Mosaic's register
    allocator at bigger tiles (32x16 non-pool = 205M scoped; parking
    EVERYTHING at t16 = 232M of spill slots, the r5 queue-2 OOM), which
    is what blocks 32x64 tiles and the fused PP81/upwind-K4 chains."""
    return os.environ.get("OMEGA_PATCH_POOL", "0") == "1"


class _Pooled:
    """A chain value slab parked in the scratch pool (or, during
    host-side planning, carried inline with its slot accounting).
    `ext` is the slab-row range [lo, hi) the value occupies in its
    full-height pool slab — reads load only those rows."""
    __slots__ = ("slot", "val", "ext")

    def __init__(self, slot, val=None, ext=None):
        self.slot = slot
        self.val = val
        self.ext = ext


def pool_life() -> int:
    """Minimum op-count lifetime for a chain value to be parked in the
    VMEM pool (OMEGA_PATCH_POOL_T).  Short-lived values stay inline SSA
    — Mosaic register-allocates those well (the t16 kernel fits in 27M)
    — while long-lived ones (h_new, mean_h, the per-tracer partials
    that cross sections) are exactly the live ranges that blow up its
    allocator at bigger tiles (r5 measurement: parking EVERYTHING at
    t16 produced 232M of register-allocator spill slots)."""
    return int(os.environ.get("OMEGA_PATCH_POOL_T", "6"))


class _InSlab:
    """Lazy reader of an input-state slab (lives in in_s, never pooled)."""
    __slots__ = ("fn",)

    def __init__(self, fn):
        self.fn = fn


class _PoolAlloc:
    """Deterministic slot allocator (stack discipline) shared between
    the planning pass and the kernel trace: identical op sequences give
    identical slot assignments, so the planned capacity is exact."""

    def __init__(self, capacity=None):
        self.capacity = capacity
        self.free = list(range(capacity)) if capacity is not None else []
        self.nmade = capacity if capacity is not None else 0
        self.inuse = 0
        self.peak = 0

    def alloc(self):
        if not self.free:
            if self.capacity is not None:
                raise RuntimeError(
                    f"VMEM pool exhausted (capacity {self.capacity})")
            self.free.append(self.nmade)
            self.nmade += 1
        s = self.free.pop()
        self.inuse += 1
        self.peak = max(self.peak, self.inuse)
        return s

    def release(self, slots):
        for s in slots:
            self.free.append(s)
            self.inuse -= 1


def _chain_extents(ops, outputs, entry_lists, R, by, YY):
    """Per-op-instance required output Y-extent [lo, hi) (slab rows).

    Only rows [R, R+by) of the final outputs are written back, and a
    stencil op's output row y reads source rows y+db for its class's
    live entry offsets db — so each value only needs the rows that can
    still reach the output block.  Y is the slab's MAJOR dim (K rides
    lanes, X sublanes), so Y slices are relayout-free and the kernel
    evaluates every op on its required rows only.  Requirements clip to
    the slab [0, YY); reads a consumer would make beyond a producer's
    extent are exactly the out-of-slab reads the build-time validity
    masks (icos_mega.kernel_validity) already model as garbage — the
    kernel zero-pads them, preserving exactness at all valid positions.

    Instance-resolved (a reassigned name like 'du' gets one extent per
    assignment).  Returns a list aligned with `ops`; None marks an op
    whose result is never consumed (skipped)."""
    req = {nm: (R, R + by) for nm in outputs}

    def merge(nm, lo, hi):
        cur = req.get(nm)
        req[nm] = (lo, hi) if cur is None else (min(cur[0], lo),
                                                max(cur[1], hi))

    ext = [None] * len(ops)
    for i in range(len(ops) - 1, -1, -1):
        op = ops[i]
        e = req.pop(op[0], None)
        ext[i] = e
        if e is None:
            continue
        lo, hi = e
        if op[1] == "st":
            lst = entry_lists[op[2]][2]
            if lst:
                mn = min(ent[3] for ent in lst)
                mx = max(ent[3] for ent in lst)
                merge(op[3], max(0, lo + mn), min(YY, hi + mx))
        else:
            for nm in _op_inputs(op):
                merge(nm, lo, hi)
    return ext


def _yslice(slab, start, stop):
    """Rows [start, stop) of a (Y, X, K) slab, zero-padding rows that
    fall outside — those reads are out-of-slab garbage by construction
    (see _chain_extents) and zeros keep garbage finite."""
    n = slab.shape[0]
    s0, s1 = max(start, 0), min(stop, n)
    body = slab[s0:s1]
    parts = []
    if s0 > start:
        parts.append(jnp.zeros((s0 - start,) + slab.shape[1:], slab.dtype))
    parts.append(body)
    if stop > s1:
        parts.append(jnp.zeros((stop - s1,) + slab.shape[1:], slab.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else body


def _eval_chain(vals, entry_lists, pget, cget, consts, L, sink=None,
                ops=None, outputs=None, R_by=None, pool=None, alloc=None):
    """Evaluate a chain (default fb_chain) on per-channel slab lists.

    vals: dict name -> [ (Y, X, K) ] * T.  pget(i) -> (Y, X) plane slab.
    cget(cname) -> list of planes or a python float.  Dead values are
    DELETED from `vals` as soon as their last reader ran (Mosaic
    allocates VMEM stack for every live jax value — without the frees
    the whole chain stays resident and blows the scoped-vmem budget).
    `sink(name, channels, ylo)`: called on finished outputs (ylo = the
    value's first slab row); when it returns True the value is not kept
    in `vals` (the kernel stores it to the output buffer immediately).

    With `R_by=(R, by)` and OMEGA_PATCH_YSHRINK on, every op evaluates
    only the slab rows that can still reach the output block (see
    _chain_extents) — Y is the slab major dim so the shrink is
    relayout-free and exact at all valid positions."""
    (dt, grav, nu2, nu4, div_factor, ed2, ed4) = consts[:7]
    if ops is None:
        ops = fb_chain(L)
    if outputs is None:
        outputs = ["h_new", "u_new"] + [f"trn{l}" for l in range(L)]

    pooled = alloc is not None

    def _deref(x):
        if isinstance(x, _Pooled):
            if x.val is not None:
                return x.val
            if x.ext is not None:
                return pool[x.slot, x.ext[0]:x.ext[1]]
            return pool[x.slot]
        if isinstance(x, _InSlab):
            return x.fn()
        return x

    probe = _deref(next(iter(vals.values()))[0])
    YY = probe.shape[0]
    KL = probe.shape[-1]
    if R_by is not None and yshrink_enabled():
        exts = _chain_extents(ops, outputs, entry_lists, R_by[0], R_by[1],
                              YY)
    else:
        exts = [(0, YY)] * len(ops)
    vext = {nm: (0, YY) for nm in vals}     # current extent per value
    cur_ext = (0, YY)                       # extent of the op being run

    def ap(tname, sname):
        src = [_deref(s) for s in vals[sname]]
        slo = vext[sname][0]
        lo, hi = cur_ext
        Td, Ts, lst = entry_lists[tname]
        outs = [None] * Td
        # the X roll (axis 1 = sublanes) is the expensive one (a real
        # sublane rotate per vreg; the Y roll is a slice/reindex of the
        # major dim) — hoist it and share across entries with the same
        # (ts, da).  Rolls/slices on different axes commute, so this is
        # bit-identical.  OMEGA_PATCH_XROLL caps how many rolled slabs
        # stay cached per stencil apply (most-reused first,
        # deterministic): every cached roll is a slab-sized value live
        # across the whole apply, and at big tiles these dominate
        # Mosaic's register-allocator spill slots (r5 queue-4: 32x16
        # single-class = 280M of spills; entries ~ hundreds).  Evicted
        # keys recompute the roll per entry — bit-identical, pure
        # compute-for-VMEM trade.
        nuse: Dict[tuple, int] = {}
        for (td, ts, da, db, pidx) in lst:
            nuse[(ts, da)] = nuse.get((ts, da), 0) + 1
        cap = os.environ.get("OMEGA_PATCH_XROLL")
        cached_keys = None
        if cap is not None:
            order = sorted(nuse.items(), key=lambda kv: (-kv[1], kv[0]))
            cached_keys = set(k for k, c in order[:int(cap)] if c > 1)
        xroll = {}
        for (td, ts, da, db, pidx) in lst:
            key = (ts, da)
            base = xroll.get(key)
            if base is None:
                base = _roll(src[ts], da, 1)
                if nuse[key] > 1 and (cached_keys is None
                                      or key in cached_keys):
                    xroll[key] = base       # (bounds VMEM live set)
            # NOTE: slice and newaxis must be SEPARATE indexing ops —
            # x[lo:hi, :, None] takes jnp's advanced-indexing path
            # and lowers to lax.gather, which Mosaic cannot lower
            w = pget(pidx)[lo:hi]
            if w.ndim == 2:         # 2-D pget: add the lane axis here
                w = w[:, :, None]
            term = w * _yslice(base, lo + db - slo, hi + db - slo)
            outs[td] = term if outs[td] is None else outs[td] + term
        zshape = (hi - lo,) + src[0].shape[1:]
        zero = jnp.zeros(zshape, src[0].dtype)
        return [o if o is not None else zero for o in outs]

    def cval(cname, T):
        lo, hi = cur_ext
        c = cget(cname)
        if isinstance(c, float):
            return [c] * T
        return [pli[lo:hi] if pli.ndim == 3 else pli[lo:hi][:, :, None]
                for pli in c]

    def run(op):
        name, kind = op[0], op[1]
        if kind == "st":
            return ap(op[2], op[3])
        fn = op[2]
        a = op[3:]
        lo, hi = cur_ext

        def v(nm):
            vlo, vhi = vext[nm]
            if (vlo, vhi) == (lo, hi):
                return [_deref(s) for s in vals[nm]]
            return [_deref(s)[lo - vlo:hi - vlo] for s in vals[nm]]

        if fn == "mul":
            return [x * y for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "sub":
            return [x - y for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "mulc":            # x * const plane; alias when == 1.0
            c = cget(a[1][1:])
            if isinstance(c, float):
                return (list(v(a[0])) if c == 1.0
                        else [x * c for x in v(a[0])])
            return [x * (pli[lo:hi] if pli.ndim == 3
                         else pli[lo:hi][:, :, None])
                    for x, pli in zip(v(a[0]), c)]
        if fn == "sub_mc":          # mask*x - y (del2_e grad-part mask)
            m = cget(a[2][1:])
            if isinstance(m, float) and m == 1.0:
                return [x - y for x, y in zip(v(a[0]), v(a[1]))]
            mm = cval(a[2][1:], len(vals[a[0]]))
            return [mi * x - y
                    for x, y, mi in zip(v(a[0]), v(a[1]), mm)]
        if fn == "axpy_m":          # x + dt*coef*(mask*y)
            coef = a[1]
            m = cget(a[3][1:])
            if isinstance(m, float) and m == 1.0:
                return [x + dt * coef * y
                        for x, y in zip(v(a[0]), v(a[2]))]
            mm = cval(a[3][1:], len(v(a[0])))
            return [x + dt * coef * (mi * y)
                    for x, y, mi in zip(v(a[0]), v(a[2]), mm)]
        if fn == "axpy":            # x + dt * coef * y
            coef = a[1]
            return [x + dt * coef * y for x, y in zip(v(a[0]), v(a[2]))]
        if fn == "tracer_rhs":      # -adv + ed2*diff2 - ed4*hyp
            return [-x + ed2 * y - ed4 * z
                    for x, y, z in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "tracer_update":   # (tr*h + dt*dtr) / h_new
            return [_safe_div(tr * h + dt * dtr, hn)
                    for tr, h, dtr, hn in zip(v(a[0]), v(a[1]),
                                              v(a[2]), v(a[3]))]
        if fn == "tracer_updc":     # (tr*h + coef*dt*dtr) / h_new
            coef = a[4]
            return [_safe_div(tr * h + coef * dt * dtr, hn)
                    for tr, h, dtr, hn in zip(v(a[0]), v(a[1]),
                                              v(a[2]), v(a[3]))]
        if fn == "tracer_acc0":     # tr*h + coef*dt*dtr (weighted acc)
            coef = a[3]
            return [tr * h + coef * dt * dtr
                    for tr, h, dtr in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "tracer_fin":      # (acc + coef*dt*dtr) / h_new
            coef = a[3]
            return [_safe_div(acc + coef * dt * dtr, hn)
                    for acc, dtr, hn in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "copy":            # free alias
            return list(v(a[0]))
        if fn == "mean2":           # 0.5 * (a + b)
            return [0.5 * (x + y) for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "upwind":          # sel(u, a, b) (aux upwind flux)
            from omega_tpu.ops.megastep import _upwind_sel
            return [_upwind_sel(u_, x, y)
                    for u_, x, y in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "upwind_prod":     # sel(u, a*b, c*d) (tracer upwind)
            from omega_tpu.ops.megastep import _upwind_sel
            return [_upwind_sel(u_, x * y, z * w_)
                    for u_, x, y, z, w_ in zip(v(a[0]), v(a[1]), v(a[2]),
                                               v(a[3]), v(a[4]))]
        # ---- FCT (Zalesak) limiter pieces — expression-for-expression
        # per core/fct.fct_tracer_tendency ----
        if fn == "upwind_mean":     # core/fct._edge_fluxes tr_up (mean
            return [jnp.where(u_ > 0, x,          # at rest, not max)
                             jnp.where(u_ < 0, y, 0.5 * (x + y)))
                    for u_, x, y in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "max2":
            return [jnp.maximum(x, y) for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "min2":
            return [jnp.minimum(x, y) for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "relu":            # exclusive positive part B+
            return [jnp.maximum(x, 0.0) for x in v(a[0])]
        if fn == "relu_neg":        # exclusive negative part B-
            return [jnp.maximum(-x, 0.0) for x in v(a[0])]
        if fn == "diff_rhs":        # ed2*diff2 - ed4*hyp
            return [ed2 * x - ed4 * y
                    for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "fct_p":           # dt * (x + y)  (in/out flux budgets)
            return [dt * (x + y) for x, y in zip(v(a[0]), v(a[1]))]
        if fn == "fct_q":           # (x - y) * h_new  (room to bounds)
            return [(x - y) * hn
                    for x, y, hn in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "fct_r":           # clip(q / max(p, eps), 0, 1)
            return [jnp.clip(q / jnp.maximum(p_, 1e-30), 0.0, 1.0)
                    for q, p_ in zip(v(a[0]), v(a[1]))]
        if fn == "fct_corr":        # f_lo + C_e * a  (limited flux)
            return [lo + jnp.where(aa >= 0, jnp.minimum(r1, s0),
                                   jnp.minimum(r0, s1)) * aa
                    for aa, lo, r0, r1, s0, s1
                    in zip(v(a[0]), v(a[1]), v(a[2]), v(a[3]),
                           v(a[4]), v(a[5]))]
        if fn == "q_vertex":        # (rvort + f) / h_v
            fv = cval(a[1][1:], 2)
            return [_safe_div(rv + f, hv)
                    for rv, f, hv in zip(v(a[0]), fv, v(a[2]))]
        if fn == "pv":              # 0.5 * (q_e*tf + tfq)
            return [0.5 * (q * t_ + tq)
                    for q, t_, tq in zip(v(a[0]), v(a[1]), v(a[2]))]
        if fn == "gssh":            # du - g*(gh - gdepth)
            gd = cval(a[2][1:], 3)
            return [du - grav * (gh - g)
                    for du, gh, g in zip(v(a[0]), v(a[1]), gd)]
        if fn == "visc2":           # du + nu2*s2*(cdd - vdr)
            s2 = cval(a[3][1:], 3)
            return [du + nu2 * s * (c - r)
                    for du, c, r, s in zip(v(a[0]), v(a[1]), v(a[2]), s2)]
        if fn == "visc4":           # du - nu4*s4*(df*cd4 - vd4)
            s4 = cval(a[3][1:], 3)
            return [du - nu4 * s * (div_factor * c - r)
                    for du, c, r, s in zip(v(a[0]), v(a[1]), v(a[2]), s4)]
        # ---- physics extensions (consts[7:12] = K, rho0, cd, kt, km;
        # lane/PCR helpers shared with the planar kernel) ----
        from omega_tpu.ops.megastep import (_lane, _pcr_diffusion,
                                            _shift_lane)
        if fn == "wind":            # du[k=0] += stress/(rho0*mean_hn)
            rho0 = consts[8]
            w = cval(a[2][1:], 3)
            return [du + jnp.where(_lane(du) == 0,
                                   _safe_div(wi, rho0 * mh), 0.0)
                    for du, mh, wi in zip(v(a[0]), v(a[1]), w)]
        if fn == "drag":  # du[k=K-1] -= cd*sqrt(ke0+ke1)*u/mean_hn
            K_, cd = consts[7], consts[9]
            return [du + jnp.where(
                _lane(du) == K_ - 1,
                -_safe_div(cd * jnp.sqrt(jnp.maximum(2.0 * kee, 0.0))
                           * u_, mh), 0.0)
                for du, kee, mh, u_ in zip(v(a[0]), v(a[1]), v(a[2]),
                                           v(a[3]))]
        if fn == "ssh_col":         # sum_k h - depth  (one lane, split)
            K_ = consts[7]
            d = cval(a[1][1:], 1)[0]
            from omega_tpu.ops.megastep import _lane
            return [jnp.sum(jnp.where(_lane(h_) < K_, h_, 0.0), -1,
                            keepdims=True) - d
                    for h_ in v(a[0])]
        if fn == "gssh_col":        # du - g * gh (column free surface)
            return [du - grav * gh
                    for du, gh in zip(v(a[0]), v(a[1]))]
        if fn in ("vmix_u", "vmix_c", "vmix_u_arr", "vmix_c_arr"):
            # backward-Euler PCR along lanes; *_arr take the kappa field
            # as a chain value (PP81), else constant coefficients
            K_, kt, km = consts[7], consts[10], consts[11]
            phis, hs = v(a[0]), v(a[1])
            if fn.endswith("_arr"):
                kaps = v(a[2])
            else:
                kaps = [km if fn == "vmix_u" else kt] * len(phis)
            outs = []
            for phi, hh, kappa in zip(phis, hs, kaps):
                dz = 0.5 * (hh + _shift_lane(hh, +1, 1.0))
                g = jnp.where(_lane(hh) < K_ - 1, dt * kappa / dz, 0.0)
                hmass = jnp.where(_lane(hh) < K_, hh, 1.0)
                b = jnp.where(_lane(hh) < K_, hh * phi, 0.0)
                outs.extend(_pcr_diffusion(g, hmass, [b]))
            return outs
        # ---- PP81 coefficient ops (core/vmix.pp81_coefficients) ----
        if fn == "lanediff":        # u_k - u_{k+1}
            return [x - _shift_lane(x, +1, 0.0) for x in v(a[0])]
        if fn == "dzhalf":          # 0.5 * (h_k + h_{k+1})
            return [0.5 * (x + _shift_lane(x, +1, 1.0)) for x in v(a[0])]
        if fn == "zero_like":
            return [jnp.zeros_like(x) for x in v(a[0])]
        if fn == "pp_n2":           # max(g*(aT dT - bS dS)/dz, 0), hole-safe
            (_, _, _, a_t, b_s, _, _) = consts[12]
            outs = []
            for T, S_, dz in zip(v(a[0]), v(a[1]), v(a[2])):
                db = grav * (a_t * (T - _shift_lane(T, +1, 0.0))
                             - b_s * (S_ - _shift_lane(S_, +1, 0.0)))
                # the safe-div guard keeps holes finite: n2 feeds a
                # cmean stencil, and 0-weight * NaN poisons valid sums
                outs.append(jnp.maximum(
                    jnp.where(dz != 0, db / jnp.where(dz != 0, dz, 1.0),
                              0.0), 0.0))
            return outs
        if fn == "pp_kc":           # kappa_cell from (n2, ke(du), dz)
            (nu0, alpha, n_exp, _, _, kt0, _) = consts[12]
            outs = []
            for n2, ke_, dz in zip(v(a[0]), v(a[1]), v(a[2])):
                shear2 = 2.0 * ke_ / (dz * dz)
                ri = n2 / jnp.maximum(shear2, 1.0e-16)
                f = 1.0 + alpha * jnp.maximum(ri, 0.0)
                nu = nu0 / f ** n_exp
                outs.append(nu / f + kt0)
            return outs
        if fn == "pp_ne":           # nu_edge from (n2_e, du, dz_e)
            (nu0, alpha, n_exp, _, _, _, km0) = consts[12]
            outs = []
            for n2, du_, dz in zip(v(a[0]), v(a[1]), v(a[2])):
                shear2 = (du_ / dz) ** 2
                ri = n2 / jnp.maximum(shear2, 1.0e-16)
                f = 1.0 + alpha * jnp.maximum(ri, 0.0)
                outs.append(nu0 / f ** n_exp + km0)
            return outs
        raise ValueError(fn)

    def _release_value(slabs):
        if alloc is not None:
            alloc.release([s.slot for s in slabs
                           if isinstance(s, _Pooled)])

    def _store(res, ext):
        """Park full-lane-width result slabs in the pool (slim K=1
        columns and the planning pass keep the value inline).  Slabs
        occupy rows [lo, hi) of a full-height pool slab, so the
        Y-extent shrink carries through parked values."""
        lo, hi = ext
        out = []
        for r in res:
            if r.shape[-1] == KL:
                slot = alloc.alloc()
                if pool is not None:
                    pool[slot, lo:hi] = r
                    out.append(_Pooled(slot, ext=(lo, hi)))
                else:
                    out.append(_Pooled(slot, r, ext=(lo, hi)))
            else:
                out.append(r)
        return out

    last = _last_use(ops, outputs)
    life = pool_life() if pooled else 0
    for i, op in enumerate(ops):
        name = op[0]
        if exts[i] is None:          # result never consumed
            continue
        cur_ext = exts[i]
        res = run(op)
        # free dead inputs BEFORE parking the result: the result's store
        # happens after its reads in program order, so reusing a dead
        # input's slot is safe and minimizes the pool peak
        dead = [nm for nm in _op_inputs(op)
                if last.get(nm, -1) == i and nm != name and nm in vals]
        for nm in dead:
            _release_value(vals[nm])
            del vals[nm]
            del vext[nm]
        if name in vals:             # reassignment: old value is dead
            _release_value(vals[name])
        if name in outputs and sink is not None \
                and sink(name, res, cur_ext[0]):
            vals.pop(name, None)
            vext.pop(name, None)
            continue
        # selective parking: only values whose lifetime spans more than
        # `life` ops go to the pool; short-lived values stay inline SSA
        park = pooled and (last.get(name, i) - i) > life
        vals[name] = _store(res, cur_ext) if park else res
        vext[name] = cur_ext
    return vals


# ----------------------------------------------------------------------
# the kernel

def _norm_phys(phys):
    phys = tuple(phys) + (False,) * (5 - len(phys)) \
        if len(phys) < 5 else tuple(phys)
    if len(phys) == 5:
        phys = phys + (None,)
    return phys


def _blocks_layout(in_blocks, L):
    """Standard (h, u x3, tr x L) channel layout per input block."""
    B = 4 + L
    lay = []
    for bi, sfx in enumerate(in_blocks):
        o = bi * B
        tr_nm = ("tr{}" if sfx == "" else
                 "tr0{}" if sfx == "0" else "tra{}")
        lay.append((f"h{sfx}", 1, o))
        lay.append((f"u{sfx}", 3, o + 1))
        for l in range(L):
            lay.append((tr_nm.format(l), 1, o + 4 + l))
    return lay


def _chain_setup(chain_kind, L, phys):
    """(chain_ops, outputs, out_map, in_layout, keep) for a chain kind —
    shared by the kernel trace and the pool planner.  in_layout is a
    list of (value_name, slab_count, first_channel) mapping the stacked
    input frames to chain values."""
    wind, drag, vmix, uw_h, uw_tr, pp = _norm_phys(phys)
    B = 4 + L
    outputs, in_blocks = None, ("",)
    in_layout = None
    out_map = dict({"h_new": 0, "u_new": 1},
                   **{f"trn{l}": 4 + l for l in range(L)})
    if chain_kind in ("rk2a", "rk2b"):
        from omega_tpu.mesh.icos_mega import rk2_stage_chain
        chain_ops = (rk2_stage_chain(L, "", 0.5, wind, drag, vmix,
                                     uw_h, uw_tr, pp)
                     if chain_kind == "rk2a"
                     else rk2_stage_chain(L, "0", 1.0, wind, drag, vmix,
                                          uw_h, uw_tr, pp))
        in_blocks = ("",) if chain_kind == "rk2a" else ("", "0")
    elif chain_kind.startswith("rk4s"):
        from omega_tpu.mesh.icos_mega import rk4_stage_chain
        stage = int(chain_kind[4:])
        chain_ops = rk4_stage_chain(L, stage, wind, drag, vmix,
                                    uw_h, uw_tr, pp)
        in_blocks = ("",) if stage == 1 else ("", "0", "_a")
        if stage < 4:
            outputs = (list(out_map) + ["h_acc", "u_acc"]
                       + [f"tracc{l}" for l in range(L)])
            out_map.update(dict({"h_acc": B, "u_acc": B + 1},
                                **{f"tracc{l}": B + 4 + l
                                   for l in range(L)}))
    elif chain_kind == "splitpre":
        from omega_tpu.mesh.icos_mega import split_pre_chain
        chain_ops = split_pre_chain(L)
        out_map = {"du_out": 0}
        outputs = ["du_out"]
    elif chain_kind == "splitpost":
        from omega_tpu.mesh.icos_mega import split_post_chain
        chain_ops = split_post_chain(L)
        out_map = dict({"h_new": 0}, **{f"trn{l}": 1 + l
                                        for l in range(L)})
        outputs = list(out_map)
    elif chain_kind == "fb2a":
        from omega_tpu.mesh.icos_mega import fb2_stage_a_chain
        chain_ops = fb2_stage_a_chain(L, uw_h, uw_tr)
        out_map = dict({"h_new": 0}, **{f"trn{l}": 1 + l
                                        for l in range(L)})
        outputs = list(out_map)
    elif chain_kind == "fb2b":
        from omega_tpu.mesh.icos_mega import fb2_stage_b_chain
        chain_ops = fb2_stage_b_chain(L, wind, drag, uw_h, vmix, pp)
        if vmix:
            # trn rides input channels and re-emits mixed
            out_map = dict({"u_new": 0}, **{f"trn{l}": 3 + l
                                            for l in range(L)})
            outputs = list(out_map)
            in_layout = ([("h_new", 1, 0)]
                         + [(f"trn{l}", 1, 1 + l) for l in range(L)]
                         + [("u", 3, 1 + L)])
        else:
            out_map = {"u_new": 0}
            outputs = ["u_new"]
            in_layout = [("h_new", 1, 0), ("u", 3, 1)]
    elif chain_kind == "fcta":
        from omega_tpu.mesh.icos_mega import fct_stage_a_chain
        chain_ops = fct_stage_a_chain(L, wind, drag, uw_h)
        out_map = dict({"h_new": 0, "u_new": 1},
                       **{f"trtd{l}": 4 + 2 * l for l in range(L)},
                       **{f"facc{l}": 5 + 2 * l for l in range(L)})
        outputs = list(out_map)
    elif chain_kind == "fctb":
        from omega_tpu.mesh.icos_mega import fct_stage_b_chain
        chain_ops = fct_stage_b_chain(L, uw_h)
        out_map = {f"trn{l}": l for l in range(L)}
        outputs = list(out_map)
        # mid block [h_new, trtd x L, facc x L] + the original state
        in_layout = ([("h_new", 1, 0)]
                     + [(f"trtd{l}", 1, 1 + l) for l in range(L)]
                     + [(f"facc{l}", 1, 1 + L + l) for l in range(L)]
                     + [("h", 1, 1 + 2 * L), ("u", 3, 2 + 2 * L)]
                     + [(f"tr{l}", 1, 5 + 2 * L + l)
                        for l in range(L)])
    else:
        chain_ops = fb_chain(L, wind, drag, vmix, uw_h, uw_tr, pp)
    if in_layout is None:
        in_layout = _blocks_layout(in_blocks, L)
    # outputs that a LATER chain op reads must stay in vals after
    # sinking (fb: the tracer updates read h_new; vmix re-reads all)
    keep = set()
    prod = {}
    for i, op in enumerate(chain_ops):
        # a read of an ALREADY-produced output name keeps it in vals
        # (incremental prod: a reassigning op — vmix_u reading u_new —
        # reads the value of the earlier assignment)
        for nm in _op_inputs(op):
            if nm in out_map and nm in prod:
                keep.add(nm)
        prod[op[0]] = i
    return chain_ops, outputs, out_map, in_layout, keep


_POOL_PLANS: Dict[tuple, int] = {}


def _pool_plan(chain_kind, L, phys, const_idx, consts, entry_lists):
    """Pool capacity (max live full-width slabs) for a chain.

    Runs the chain once on tiny dummy slabs with the same allocator
    discipline as the kernel trace — identical op sequence, identical
    slot pattern — so the returned capacity is exact, not a bound."""
    phys = _norm_phys(phys)
    key = (chain_kind, L, phys, _hashable(const_idx), pool_life())
    if key in _POOL_PLANS:
        return _POOL_PLANS[key]
    chain_ops, outputs, out_map, in_layout, keep = _chain_setup(
        chain_kind, L, phys)
    if outputs is None:
        outputs = ["h_new", "u_new"] + [f"trn{l}" for l in range(L)]
    Yp, Xp = 4, 8
    cdict = dict(const_idx)
    with jax.ensure_compile_time_eval():
        zero2 = jnp.zeros((Yp, Xp), jnp.float32)
        slab = lambda: jnp.zeros((Yp, Xp, 128), jnp.float32)
        vals = {}
        for nm, T, ch0 in in_layout:
            vals[nm] = [slab() for _ in range(T)]
        pget = lambda i: zero2

        def cget(cname):
            c = cdict[cname]
            if isinstance(c, float):
                return c
            return [zero2 for _ in range(c[1])]

        # entry lists only contribute Td/Ts (slab counts) to the slot
        # pattern; one representative entry per table keeps planning
        # cheap and slot-identical to any class's filtered list
        elists = {name: (Td, Ts, tuple(lst[:1]))
                  for name, (Td, Ts, lst) in entry_lists.items()}
        alloc = _PoolAlloc()
        _eval_chain(vals, elists, pget, cget, consts, L,
                    sink=lambda name, res, ylo: name not in keep,
                    ops=chain_ops, outputs=outputs, alloc=alloc)
    _POOL_PLANS[key] = alloc.peak
    return alloc.peak


def _kernel(f_hbm, p_hbm, c_hbm, o_hbm, *, class_lists, const_idx, consts,
            L, S, SS, by, nt, K, npl, chain_kind="fb", wslice=False,
            class_lanes=None, phys=(False, False, False), pool_nbuf=0):
    CH = f_hbm.shape[0]
    CHO = o_hbm.shape[0]    # rk2b reads 2 state blocks, writes one
    (byy, byx) = (by, by) if isinstance(by, int) else by
    (nty, ntx) = (nt, nt) if isinstance(nt, int) else nt
    YY, XX = byy + 2 * R, byx + 2 * R
    NP = f_hbm.shape[1]     # 10 on one device; a subset under sharding
    B = 4 + L
    phys = tuple(phys) + (False,) * (5 - len(phys)) \
        if len(phys) < 5 else tuple(phys)
    if len(phys) == 5:
        phys = phys + (None,)
    wind, drag, vmix, uw_h, uw_tr, pp = phys
    (chain_ops, outputs, out_map, in_layout, keep) = _chain_setup(
        chain_kind, L, phys)

    def body(in_s, pl_s, out_s, sem, pool_s=None):
        nblocks = NP * nty * ntx
        cp = pltpu.make_async_copy

        exts = sorted(set(class_lanes)) if class_lanes else None
        if exts == [npl]:
            exts = None             # nothing to trim

        def dmas(slot, bidx, action):
            r = bidx // (nty * ntx)
            rem = bidx % (nty * ntx)
            ty, tx = rem // ntx, rem % ntx
            ys = pl.ds(ty * byy, YY)     # SS coords: tile - R + FR
            xs = pl.ds(tx * byx, XX)
            getattr(cp(f_hbm.at[:, r, ys, xs], in_s.at[slot],
                       sem.at[2 * slot]), action)()
            if exts is None:
                getattr(cp(p_hbm.at[r, ys, xs], pl_s.at[slot],
                           sem.at[2 * slot + 1]), action)()
                return
            # per-class lane trim: a block copies only its class's lane
            # prefix (prep orders planes so each class's live set is a
            # prefix); start and wait recompute the same branch from the
            # SMEM class id, so the DMA descriptors pair up exactly.
            # NOTE: the prefetch call site reads c_hbm[bidx+1] — that
            # read is predicated by the caller's pl.when(bidx+1 <
            # nblocks); do not hoist this read out of `dmas`.
            cls = c_hbm[bidx]
            for ext in exts:
                cond = False
                for ci, e in enumerate(class_lanes):
                    if e == ext:
                        cond = jnp.logical_or(cond, cls == ci)

                @pl.when(cond)
                def _(ext=ext):
                    getattr(cp(p_hbm.at[r, ys, xs, pl.ds(0, ext)],
                               pl_s.at[slot, :, :, pl.ds(0, ext)],
                               sem.at[2 * slot + 1]), action)()

        def out_dmas(slot, bidx):
            r = bidx // (nty * ntx)
            rem = bidx % (nty * ntx)
            ty, tx = rem // ntx, rem % ntx
            return (cp(out_s.at[slot],
                       o_hbm.at[:, r, pl.ds(ty * byy, byy),
                                pl.ds(tx * byx, byx)],
                       sem.at[4 + slot]),)

        dmas(0, 0, "start")

        def loop(bidx, _):
            cur = bidx % 2
            nxt = (bidx + 1) % 2

            @pl.when(bidx + 1 < nblocks)
            def _():
                dmas(nxt, bidx + 1, "start")

            dmas(cur, bidx, "wait")

            # wslice: extract each weight plane as a LANE SLICE
            # (YY, YY, 1) instead of a 2-D (YY, YY) read.  The 2-D
            # read lands in the X-on-lanes layout and the
            # [:, :, None] that follows is a per-entry relayout to
            # X-on-sublanes before the K lane-broadcast; the lane
            # slice stays in the 3-D layout end to end.
            wsl = wslice
            if wsl:
                pget = lambda i: pl_s[cur, :, :, i:i + 1]
            else:
                pget = lambda i: pl_s[cur, :, :, i]

            def cget(cname):
                c = const_idx[cname]
                if isinstance(c, float):
                    return c
                base, T = c
                if wsl:
                    return [pl_s[cur, :, :, base + t:base + t + 1]
                            for t in range(T)]
                return [pl_s[cur, :, :, base + t] for t in range(T)]

            @pl.when(bidx >= 2)
            def _():
                for d in out_dmas(cur, bidx - 2):
                    d.wait()

            # outputs stream into out_s as the chain finishes them, so
            # finished values don't stay resident in the VMEM stack;
            # h_new is kept — the velocity section still reads it
            cx = slice(R, R + byx)

            def sink(name, res, ylo):
                ch = out_map[name]
                for i, r in enumerate(res):
                    out_s[cur, ch + i] = r[slice(R - ylo, R - ylo + byy),
                                           cx]
                return name not in keep

            def eval_with(entry_lists):
                # input channels per the chain's in_layout ("" block =
                # the in-kernel state, "0" = the original state, "_a" =
                # the RK4 accumulator; fctb adds mid-field channels)
                vals = {}
                if pool_s is not None:
                    rd = lambda ch: _InSlab(
                        lambda ch=ch: in_s[cur, ch])
                else:
                    rd = lambda ch: in_s[cur, ch]
                for nm, T, ch0 in in_layout:
                    vals[nm] = [rd(ch0 + i) for i in range(T)]
                _eval_chain(vals, entry_lists, pget, cget, consts, L,
                            sink=sink, ops=chain_ops, outputs=outputs,
                            R_by=(R, byy), pool=pool_s,
                            alloc=(_PoolAlloc(pool_nbuf)
                                   if pool_s is not None else None))

            if os.environ.get("OMEGA_PATCH_NOP") == "1":
                # diagnostic: the kernel's pure-DMA floor (state +
                # plane slabs in, centers copied out; no chain) — NOT
                # a time step
                for ch in range(CHO):
                    out_s[cur, ch] = in_s[cur, ch, slice(R, R + byy), cx]
            elif len(class_lists) == 1:
                eval_with(class_lists[0])
            else:
                # block-class specialization: exactly one branch fires;
                # seam-free blocks skip the seam-rotated entries
                cls = c_hbm[bidx]
                for ci, clists in enumerate(class_lists):
                    @pl.when(cls == ci)
                    def _(clists=clists):
                        eval_with(clists)

            for d in out_dmas(cur, bidx):
                d.start()

        jax.lax.fori_loop(0, nblocks, loop, None)

        @pl.when(nblocks >= 2)
        def _():
            for d in out_dmas(nblocks % 2, nblocks - 2):
                d.wait()
        for d in out_dmas((nblocks - 1) % 2, nblocks - 1):
            d.wait()

    scratch = dict(
        in_s=pltpu.VMEM((2, f_hbm.shape[0], YY, XX, K), f_hbm.dtype),
        pl_s=pltpu.VMEM((2, YY, XX, npl), p_hbm.dtype),
        out_s=pltpu.VMEM((2, o_hbm.shape[0], byy, byx, K), f_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((6,)),
    )
    if pool_nbuf:
        scratch["pool_s"] = pltpu.VMEM((pool_nbuf, YY, XX, K),
                                       f_hbm.dtype)
    pl.run_scoped(body, **scratch)


@functools.partial(jax.jit, static_argnames=(
    "class_lists", "const_idx", "consts", "L", "S", "SS", "by", "nt",
    "chain_kind", "wslice", "class_lanes", "phys",
    "interpret", "pool_nbuf"))
def _call(frames, planes, block_class, *, class_lists, const_idx, consts,
          L, S, SS, by, nt, interpret, chain_kind="fb", wslice=False,
          class_lanes=None, phys=(False, False, False), pool_nbuf=0):
    K = frames.shape[-1]
    kern = functools.partial(
        _kernel, class_lists=tuple(dict(cl) for cl in class_lists),
        const_idx=dict(const_idx),
        consts=consts, L=L, S=S, SS=SS, by=by, nt=nt, K=K,
        npl=planes.shape[-1], chain_kind=chain_kind, wslice=wslice,
        class_lanes=class_lanes, phys=phys, pool_nbuf=pool_nbuf)
    if chain_kind.startswith("rk4s") and chain_kind != "rk4s4":
        cho = 2 * (4 + L)
    elif chain_kind == "splitpre":
        cho = 3
    elif chain_kind == "splitpost":
        cho = 1 + L
    elif chain_kind == "fcta":
        cho = 4 + 2 * L
    elif chain_kind == "fctb":
        cho = L
    elif chain_kind == "fb2a":
        cho = 1 + L
    elif chain_kind == "fb2b":
        cho = 3 + (L if phys[2] else 0)    # vmix re-emits mixed trn
    else:
        cho = 4 + L
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (cho, frames.shape[1], S, S, K), frames.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        # the chain's live set + double-buffered slabs exceed the 16MB
        # default scoped budget; v5e VMEM is large enough for ~2x that
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get(
                "OMEGA_PATCH_VMEM_MB", "127")) * 1024 * 1024),
        interpret=interpret,
    )(frames, planes, block_class)


# ----------------------------------------------------------------------
# step assembly

def _hashable(x):
    if isinstance(x, dict):
        return tuple(sorted((k, _hashable(v)) for k, v in x.items()))
    if isinstance(x, (list, tuple)):
        return tuple(_hashable(v) for v in x)
    return x


def _assemble_frames(p, state, L, K, Kp, dtype):
    """Flat state -> stacked (CH, 10, SS, SS, Kp) content frames."""
    h, u, tr = state
    n, SS = p.n, p.SS
    NG = 10 * n * n

    def frames_of(cls, flat, T):
        grid = flat[:T * NG].reshape(T, 10, n, n, K)
        fr = jnp.zeros((T, 10, SS, SS, K), dtype)
        fr = fr.at[:, :, FR + MH:FR + MH + n, FR + MH:FR + MH + n].set(grid)
        pos, src = p.fills[cls]
        fr = fr.reshape(-1, K).at[pos].set(flat[src]).reshape(
            T, 10, SS, SS, K)
        return fr

    frames = jnp.concatenate(
        [frames_of("cell", h, 1), frames_of("edge", u, 3)]
        + [frames_of("cell", tr[l], 1) for l in range(L)], axis=0)
    if Kp != K:
        frames = jnp.pad(frames, ((0, 0),) * 4 + ((0, Kp - K),))
    return frames


def _run_kernel(p, cfg, frames, dt, L, interpret, chain_kind="fb",
                wind=None, mesh=None):
    """`wind` is a make_wind bundle; its planes array (the const stack
    with the reserved wind lanes filled) replaces p.planes."""
    from omega_tpu.ops.megastep import _vmix_on
    tc = cfg.tendencies
    vm = cfg.vert_mix
    vmix = _vmix_on(cfg)
    pp_params = None
    pp_idx = None
    if vmix and vm.scheme == "pp81":
        pp_params = (vm.nu0, vm.alpha, vm.n_exp, vm.eos_alpha_t,
                     vm.eos_beta_s, vm.kappa_tracer, vm.kappa_momentum)
        pp_idx = (vm.temp_index, vm.salt_index)
    consts = (float(dt), cfg.gravity, tc.visc_del2, tc.visc_del4,
              tc.div_factor, tc.eddy_diff2, tc.eddy_diff4,
              # physics block (consts[7:12]; [12] = PP81 params;
              # [13] = the OMEGA_PATCH_XROLL cache cap, carried here so
              # an in-process A/B busts the _call jit cache — the value
              # itself is re-read from the env inside _eval_chain.ap)
              cfg.nvertlayers, tc.density0,
              tc.bottom_drag_coeff if tc.bottom_drag else 0.0,
              vm.kappa_tracer if vmix else None,
              vm.kappa_momentum if vmix else None,
              pp_params, os.environ.get("OMEGA_PATCH_XROLL"))
    phys = (wind is not None,
            bool(tc.bottom_drag and tc.bottom_drag_coeff != 0.0), vmix,
            cfg.flux_thickness_type == "upwind",
            cfg.flux_tracer_type == "upwind",
            pp_idx)
    trim = os.environ.get("OMEGA_PATCH_LANETRIM", "0") == "1"
    pool_nbuf = 0
    if pool_enabled():
        pool_nbuf = _pool_plan(chain_kind, L, phys,
                               _hashable(p.const_idx), consts,
                               p.entry_lists)
    return _call(frames, _planes_of(p, mesh) if wind is None else wind[0],
                 p.block_class,
                 class_lists=_hashable(p.class_lists),
                 const_idx=_hashable(p.const_idx),
                 consts=consts, L=L, S=p.S, SS=p.SS, by=p.by, nt=p.nt,
                 interpret=interpret, chain_kind=chain_kind, phys=phys,
                 wslice=os.environ.get("OMEGA_PATCH_WSLICE", "0") == "1",
                 class_lanes=p.class_lanes if trim else None,
                 pool_nbuf=pool_nbuf)


def make_wind(mesh, cfg, wind_stress, dtype):
    """Build the per-segment wind bundle for the patch kernels:
    (planes-with-wind-lanes-filled, (zonal_sub, merid_sub)).

    The cell wind stress rotates onto edge normals ONCE here
    (WindForcingAuxVars.h:13-40), scatters into edge frames (content +
    halo fills) and lands in the three reserved const-plane lanes; the
    submesh slice feeds the composed pole-fix step, whose own rotation
    reproduces the global one exactly on its interior fix rows."""
    if wind_stress is None or not cfg.tendencies.wind_forcing:
        return None
    from omega_tpu.core import aux as auxmod
    p = _prep(mesh, dtype, fct=cfg.flux_tracer_type == "fct")
    stress = jnp.asarray(auxmod.wind_normal_stress(
        mesh, cfg, wind_stress[0], wind_stress[1]), dtype)
    n, SS = p.n, p.SS
    NG = 10 * n * n
    grid = stress[:3 * NG].reshape(3, 10, n, n)
    fr = jnp.zeros((3, 10, SS, SS), dtype)
    fr = fr.at[:, :, FR + MH:FR + MH + n, FR + MH:FR + MH + n].set(grid)
    pos, src = p.fills["edge"]
    fr = fr.reshape(-1, 1).at[pos].set(stress[src][:, None]) \
        .reshape(3, 10, SS, SS)
    j0 = p.wind_lanes
    planes = _planes_of(p, mesh)
    for tt in range(3):
        planes = planes.at[..., j0 + tt].set(fr[tt])
    mg = p.mg
    wsub = (jnp.asarray(wind_stress[0])[mg.sub_cells],
            jnp.asarray(wind_stress[1])[mg.sub_cells])
    return planes, wsub


def fb_patch_megastep(mesh, cfg, state, t, dt, interpret=None,
                      wind_stress=None):
    """One forward-backward step on a patch-structured icos mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, u, tr = state
    K = h.shape[-1]
    L = tr.shape[0]
    dtype = h.dtype
    p = _prep(mesh, dtype)
    n, S, SS = p.n, p.S, p.SS
    NG = 10 * n * n
    Kp = -(-K // 128) * 128

    frames = _assemble_frames(p, state, L, K, Kp, dtype)
    wb = make_wind(mesh, cfg, wind_stress, dtype)
    out = _run_kernel(p, cfg, frames, dt, L, interpret, wind=wb,
                      mesh=mesh)
    if Kp != K:
        out = out[..., :K]

    # ---- submesh fix (independent of the kernel; composed stepper) ----
    from omega_tpu.core.state import ModelState
    from omega_tpu.stepping.steppers import forward_backward_step
    sub_state = ModelState(h=h[p.sub_cells], u=u[p.sub_edges],
                           tracers=tr[:, p.sub_cells])
    sub_out = forward_backward_step(p.sub_mesh, cfg, sub_state, t, dt,
                                    wind_stress=None if wb is None
                                    else wb[1])

    # ---- paste-back ----
    def paste(oname, ch0, T, N, flat_fix):
        grid = out[ch0:ch0 + T, :, MH:MH + n, MH:MH + n]
        flat = jnp.concatenate(
            [grid.reshape(T * NG, K),
             jnp.zeros((N - T * NG, K), dtype)])
        rim, rpos, dead, fix = p.outputs[oname]
        if dead.size:
            flat = flat.at[dead].set(0.0)
        if rim.size:
            flat = flat.at[rim].set(
                out[ch0:ch0 + T].reshape(-1, K)[rpos])
        if fix.size:
            flat = flat.at[fix].set(flat_fix(fix))
        return flat

    E, C = mesh.nedges, mesh.ncells
    h_new = paste("h", 0, 1, C,
                  lambda fx: sub_out.h[p.fix_cells_local[
                      jnp.searchsorted(p.fix_cells_global, fx)]])
    u_new = paste("u", 1, 3, E,
                  lambda fx: sub_out.u[p.fix_edges_local[
                      jnp.searchsorted(p.fix_edges_global, fx)]])
    trn = []
    for l in range(L):
        trn.append(paste("tr", 4 + l, 1, C,
                         lambda fx: sub_out.tracers[l][p.fix_cells_local[
                             jnp.searchsorted(p.fix_cells_global, fx)]]))
    return type(state)(h=h_new, u=u_new, tracers=jnp.stack(trn))


# ----------------------------------------------------------------------
# persistent-frame stepping (frames as the lax.scan carry)
#
# The per-step frame assembly + paste-back of fb_patch_megastep moves
# ~4x the state size through HBM row scatters each step.  Keeping the
# frames as the scan carry, a step is: kernel -> tiny submesh step ->
# in-frame halo refresh (refill invalid positions from valid ones,
# scatter the handful of pole rows, re-zero lattice holes).

def stack_frames(mesh, cfg, state):
    """Flat state -> (frames, fix_vals) scan carry.  FCT configs carry
    fix rows on the FCT fix sets (their limiter chain has its own
    validity closure)."""
    h, u, tr = state
    K, L = h.shape[-1], tr.shape[0]
    fct = cfg.flux_tracer_type == "fct"
    p = _prep(mesh, h.dtype, fct=fct)
    Kp = -(-K // 128) * 128
    frames = _assemble_frames(p, state, L, K, Kp, h.dtype)
    fixc = p.fct_fix_cells_global if fct else p.fix_cells_global
    fixe = p.fct_fix_edges_global if fct else p.fix_edges_global
    fix = dict(h=h[fixc], u=u[fixe], tr=tr[:, fixc])
    return frames, fix


def _refresh_frames(p, nf, nfix, K, Kp, L, persist=None):
    """In-frame halo refresh: refill invalid positions from exact ones,
    scatter the fix rows, re-zero the lattice holes."""
    if persist is None:
        persist = p.persist
    pc, pe = persist["cell"], persist["edge"]

    def pad_rows(rows):
        if Kp == K:
            return rows
        return jnp.pad(rows, ((0, 0), (0, Kp - K)))

    def refresh(flat, m, fix_rows):
        flat = flat.at[m["refill_pos"]].set(flat[m["refill_src"]])
        if m["fix_pos"].size:
            flat = flat.at[m["fix_pos"]].set(
                pad_rows(fix_rows)[m["fix_row"]])
        if m["zero_pos"].size:
            flat = flat.at[m["zero_pos"]].set(0.0)
        return flat

    sh1 = nf[0].shape
    nf = nf.at[0].set(refresh(nf[0].reshape(-1, Kp), pc,
                              nfix["h"]).reshape(sh1))
    nf = nf.at[1:4].set(refresh(nf[1:4].reshape(-1, Kp), pe,
                                nfix["u"]).reshape(nf[1:4].shape))
    for l in range(L):
        nf = nf.at[4 + l].set(refresh(nf[4 + l].reshape(-1, Kp), pc,
                                      nfix["tr"][l]).reshape(sh1))
    return nf


def fb_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                             interpret=None, wind=None):
    """One FB step on the (frames, fix_vals) carry. `wind` is a
    make_wind bundle, built once per segment (constant within a scan)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype)
    Kp = frames.shape[-1]

    out = _run_kernel(p, cfg, frames, dt, L, interpret, wind=wind,
                      mesh=mesh)

    # ---- submesh state from the (fully refreshed) current frames ----
    from omega_tpu.core.state import ModelState
    from omega_tpu.stepping.steppers import forward_backward_step
    cflat = frames[0].reshape(-1, Kp)
    eflat = frames[1:4].reshape(-1, Kp)
    h_sub = cflat[p.sub_cell_src][..., :K].at[p.fix_cells_local].set(
        fix["h"])
    u_sub = eflat[p.sub_edge_src][..., :K].at[p.fix_edges_local].set(
        fix["u"])
    tr_sub = jnp.stack([
        frames[4 + l].reshape(-1, Kp)[p.sub_cell_src][..., :K]
        for l in range(L)]).at[:, p.fix_cells_local].set(fix["tr"])
    sub_out = forward_backward_step(
        p.sub_mesh, cfg, ModelState(h=h_sub, u=u_sub, tracers=tr_sub),
        t, dt, wind_stress=None if wind is None else wind[1])
    nfix = dict(h=sub_out.h[p.fix_cells_local],
                u=sub_out.u[p.fix_edges_local],
                tr=sub_out.tracers[:, p.fix_cells_local])

    # ---- frame refresh ----
    nf = frames.at[:, :, FR:FR + p.S, FR:FR + p.S].set(out)
    return _refresh_frames(p, nf, nfix, K, Kp, L), nfix



def rk2_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                              interpret=None, wind=None):
    """One midpoint-RK2 step on the (frames, fix_vals) carry.

    The frame margins are MH=8 wide — one tendency-chain radius — so
    RK2's two evaluations run as TWO kernel launches with an in-frame
    refresh between (the same deep-halo tradeoff as the composed
    stepper's mid-step exchange): stage A emits the midpoint state,
    stage B reads (midpoint, original) stacked in the channel dim and
    emits the full step (mesh/icos_mega.rk2_stage_chain).  The pole-fix
    rows advance stage by stage on the standard fix submesh, re-gathered
    from the REFRESHED frames at each stage boundary so one chain radius
    of submesh padding suffices (mirrors steppers.rk2_step)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype)
    Kp = frames.shape[-1]
    from omega_tpu.core import tendencies as tend_mod

    def sub_state(fr, fx):
        cflat = fr[0].reshape(-1, Kp)
        eflat = fr[1:4].reshape(-1, Kp)
        h = cflat[p.sub_cell_src][..., :K].at[
            p.fix_cells_local].set(fx["h"])
        u = eflat[p.sub_edge_src][..., :K].at[
            p.fix_edges_local].set(fx["u"])
        tr = jnp.stack([
            fr[4 + l].reshape(-1, Kp)[p.sub_cell_src][..., :K]
            for l in range(L)]).at[:, p.fix_cells_local].set(fx["tr"])
        return h, u, tr

    def fix_rows(h, u, tr):
        return dict(h=h[p.fix_cells_local],
                    u=u[p.fix_edges_local],
                    tr=tr[:, p.fix_cells_local])

    wsub = None if wind is None else wind[1]
    # ---- stage A: midpoint ----
    out_a = _run_kernel(p, cfg, frames, dt, L, interpret,
                        chain_kind="rk2a", wind=wind, mesh=mesh)
    h0, u0, tr0 = sub_state(frames, fix)
    k1 = tend_mod.compute_all_tendencies(p.sub_mesh, cfg,
                                         h0, u0, tr0, t, wsub)
    h_m = h0 + 0.5 * dt * k1.dh
    u_m = u0 + 0.5 * dt * k1.du
    tr_m = (tr0 * h0[None] + 0.5 * dt * k1.dtr) / h_m[None]
    mid_fix = fix_rows(h_m, u_m, tr_m)

    mid = frames.at[:, :, FR:FR + p.S, FR:FR + p.S].set(out_a)
    mid = _refresh_frames(p, mid, mid_fix, K, Kp, L)

    # ---- stage B: full step from the original state ----
    out_b = _run_kernel(p, cfg, jnp.concatenate([mid, frames]), dt, L,
                        interpret, chain_kind="rk2b", wind=wind, mesh=mesh)
    h_m2, u_m2, tr_m2 = sub_state(mid, mid_fix)
    k2 = tend_mod.compute_all_tendencies(p.sub_mesh, cfg,
                                         h_m2, u_m2, tr_m2,
                                         t + 0.5 * dt, wsub)
    h_n = h0 + dt * k2.dh
    u_n = u0 + dt * k2.du
    tr_n = (tr0 * h0[None] + dt * k2.dtr) / h_n[None]
    # operator-split vmix on the final submesh state (rk2_step's _mix)
    from omega_tpu.core.state import ModelState as _MS
    from omega_tpu.stepping.steppers import _mix
    st_n = _mix(p.sub_mesh, cfg, _MS(h=h_n, u=u_n, tracers=tr_n), dt)
    nfix = fix_rows(st_n.h, st_n.u, st_n.tracers)

    nf = frames.at[:, :, FR:FR + p.S, FR:FR + p.S].set(out_b)
    return _refresh_frames(p, nf, nfix, K, Kp, L), nfix


def _fct_diffusion_tendency(sub, cfg, h, u, tr, mean_h_edge):
    """The del2/del4 tracer terms of tendencies.compute_tracer_tendency,
    alone — the part FCT stage A accumulates before the limiter."""
    from omega_tpu.core import aux as auxmod
    from omega_tpu.ops import trisk
    tc = cfg.tendencies
    tr_aux = auxmod.tracer_aux(sub, cfg, h, u, tr, mean_h_edge)
    tend = tc.eddy_diff2 * auxmod._weighted_cell_laplacian(
        sub, trisk.col(sub, "mesh_scaling_del2") * mean_h_edge, tr)
    return tend - tc.eddy_diff4 * auxmod._weighted_cell_laplacian(
        sub, trisk.col(sub, "mesh_scaling_del4"),
        tr_aux.del2_tracers_cell)


def fct_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                              interpret=None, wind=None):
    """One FB step with Zalesak FCT tracer fluxes on the (frames,
    fix_vals) carry — TWO kernel launches with an in-frame refresh
    between (core/fct.py on kernel slabs; the limiter's radius-10 chain
    exceeds the MH=8 margins, so it splits where the provisional field
    tr_td is formed):

      stage A (icos_mega.fct_stage_a_chain): h_new, u_new, the
        provisional trtd{l} and the diffusion-only accumulated
        numerator facc{l} = tr h + dt (ed2 diff2 - ed4 hyp);
      refresh of [h_new, trtd, facc] on the FCT persist maps;
      stage B (fct_stage_b_chain): the limiter from the refreshed mid
        fields + the original frames, emitting trn{l}.

    Pole/defect rows advance on the FCT fix submesh via the composed
    pieces (core/fct.fct_provisional / fct_limited_tendency)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype, fct=True)
    Kp = frames.shape[-1]
    S = p.S
    from omega_tpu.core import fct as fctmod
    from omega_tpu.core import tendencies as tend_mod

    # ---- stage A kernel ----
    out_a = _run_kernel(p, cfg, frames, dt, L, interpret,
                        chain_kind="fcta", wind=wind, mesh=mesh)

    # ---- composed stage A on the FCT fix submesh ----
    sub = p.fct_sub_mesh
    fc, fe = p.fct_fix_cells_local, p.fct_fix_edges_local
    cflat = frames[0].reshape(-1, Kp)
    eflat = frames[1:4].reshape(-1, Kp)
    h0 = cflat[p.fct_sub_cell_src][..., :K].at[fc].set(fix["h"])
    u0 = eflat[p.fct_sub_edge_src][..., :K].at[fe].set(fix["u"])
    tr0 = jnp.stack([
        frames[4 + l].reshape(-1, Kp)[p.fct_sub_cell_src][..., :K]
        for l in range(L)]).at[:, fc].set(fix["tr"])
    wsub = None if wind is None else wind[1]
    dh, thick_aux = tend_mod.compute_thickness_tendency(sub, cfg, h0,
                                                        u0, t)
    h_new_s = h0 + dt * dh
    trtd_s = fctmod.fct_provisional(sub, h0, h_new_s, u0, tr0, dt,
                                    thick_aux.flux_h_edge)
    dtrd_s = _fct_diffusion_tendency(sub, cfg, h0, u0, tr0,
                                     thick_aux.mean_h_edge)
    facc_s = tr0 * h0[None] + dt * dtrd_s
    du, _ = tend_mod.compute_velocity_tendency(sub, cfg, h_new_s, u0,
                                               t + dt, wsub)
    u_new_s = u0 + dt * du
    mid_fix = dict(h=h_new_s[fc], trtd=trtd_s[:, fc],
                   facc=facc_s[:, fc])

    # ---- mid frame stack [h_new, trtd x L, facc x L], refreshed ----
    pcf = p.fct_persist["cell"]

    def pad_rows(rows):
        if Kp == K:
            return rows
        return jnp.pad(rows, ((0, 0), (0, Kp - K)))

    def rfr(ch, rows):
        fr = jnp.zeros((10, p.SS, p.SS, Kp), frames.dtype)
        fr = fr.at[:, FR:FR + S, FR:FR + S].set(out_a[ch])
        flat = fr.reshape(-1, Kp)
        flat = flat.at[pcf["refill_pos"]].set(flat[pcf["refill_src"]])
        if pcf["fix_pos"].size:
            flat = flat.at[pcf["fix_pos"]].set(
                pad_rows(rows)[pcf["fix_row"]])
        if pcf["zero_pos"].size:
            flat = flat.at[pcf["zero_pos"]].set(0.0)
        return flat.reshape(fr.shape)

    mid = jnp.stack(
        [rfr(0, mid_fix["h"])]
        + [rfr(4 + 2 * l, mid_fix["trtd"][l]) for l in range(L)]
        + [rfr(5 + 2 * l, mid_fix["facc"][l]) for l in range(L)])

    # ---- stage B kernel (mid block + original frames) ----
    out_b = _run_kernel(p, cfg, jnp.concatenate([mid, frames]), dt, L,
                        interpret, chain_kind="fctb", wind=wind, mesh=mesh)

    # ---- composed stage B on the fix submesh (from the REFRESHED mid
    # fields, like the RK2 stage boundary re-gather) ----
    mflat = mid.reshape(1 + 2 * L, -1, Kp)
    h_new_m = mflat[0][p.fct_sub_cell_src][..., :K].at[fc].set(
        mid_fix["h"])
    trtd_m = jnp.stack([
        mflat[1 + l][p.fct_sub_cell_src][..., :K]
        for l in range(L)]).at[:, fc].set(mid_fix["trtd"])
    facc_m = jnp.stack([
        mflat[1 + L + l][p.fct_sub_cell_src][..., :K]
        for l in range(L)]).at[:, fc].set(mid_fix["facc"])
    adv_m = fctmod.fct_limited_tendency(sub, h_new_m, u0, tr0, trtd_m,
                                        dt, thick_aux.flux_h_edge)
    trn_s = (facc_m + dt * adv_m) / h_new_m[None]
    nfix = dict(h=mid_fix["h"], u=u_new_s[fe], tr=trn_s[:, fc])

    # ---- final frames + refresh on the FCT maps ----
    out_fin = jnp.concatenate([out_a[:4], out_b], axis=0)
    nf = frames.at[:, :, FR:FR + S, FR:FR + S].set(out_fin)
    return _refresh_frames(p, nf, nfix, K, Kp, L,
                           persist=p.fct_persist), nfix


def fb2_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                              interpret=None, wind=None):
    """One FB step as TWO staged kernels (OMEGA_PATCH_FB2=1): stage A =
    the thickness + tracer sections (fb2_stage_a_chain), an in-frame
    refresh of h_new, stage B = the velocity section reading the
    refreshed h_new plus the original u channels.  Bit-equal chains to
    the single-kernel FB split at an op boundary, so the standard
    validity masks / persist maps / fix submesh apply unchanged.  This
    halves the largest straight-line kernel body — the quantity
    Mosaic's register-allocator spill slots scale with — to buy VMEM
    headroom for bigger tiles."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype)
    Kp = frames.shape[-1]
    S = p.S
    from omega_tpu.core import tendencies as tend_mod

    # ---- stage A kernel: h_new + trn ----
    out_a = _run_kernel(p, cfg, frames, dt, L, interpret,
                        chain_kind="fb2a", wind=wind, mesh=mesh)

    # ---- composed stage A on the fix submesh ----
    sub = p.sub_mesh
    fc, fe = p.fix_cells_local, p.fix_edges_local
    cflat = frames[0].reshape(-1, Kp)
    eflat = frames[1:4].reshape(-1, Kp)
    h0 = cflat[p.sub_cell_src][..., :K].at[fc].set(fix["h"])
    u0 = eflat[p.sub_edge_src][..., :K].at[fe].set(fix["u"])
    tr0 = jnp.stack([
        frames[4 + l].reshape(-1, Kp)[p.sub_cell_src][..., :K]
        for l in range(L)]).at[:, fc].set(fix["tr"])
    wsub = None if wind is None else wind[1]
    dh, thick_aux = tend_mod.compute_thickness_tendency(sub, cfg, h0,
                                                        u0, t)
    h_new_s = h0 + dt * dh
    dtr, _ = tend_mod.compute_tracer_tendency(
        sub, cfg, h0, u0, tr0, thick_aux.mean_h_edge, t,
        h_new=h_new_s, dt=dt, flux_h_edge=thick_aux.flux_h_edge)
    trn_s = (tr0 * h0[None] + dt * dtr) / h_new_s[None]

    # ---- refreshed mid frames (h_new; + trn when vmix runs in B) ----
    from omega_tpu.ops.megastep import _vmix_on
    vmix = _vmix_on(cfg)
    pc = p.persist["cell"]

    def pad_rows(rows):
        if Kp == K:
            return rows
        return jnp.pad(rows, ((0, 0), (0, Kp - K)))

    def rfr(ch, rows):
        fr = jnp.zeros((10, p.SS, p.SS, Kp), frames.dtype)
        fr = fr.at[:, FR:FR + S, FR:FR + S].set(out_a[ch])
        flat = fr.reshape(-1, Kp)
        flat = flat.at[pc["refill_pos"]].set(flat[pc["refill_src"]])
        if pc["fix_pos"].size:
            flat = flat.at[pc["fix_pos"]].set(
                pad_rows(rows)[pc["fix_row"]])
        if pc["zero_pos"].size:
            flat = flat.at[pc["zero_pos"]].set(0.0)
        return flat.reshape(fr.shape)

    mid_h = rfr(0, h_new_s[fc])
    if vmix:
        mid = jnp.concatenate(
            [mid_h[None]]
            + [rfr(1 + l, trn_s[l][fc])[None] for l in range(L)]
            + [frames[1:4]])
    else:
        mid = jnp.concatenate([mid_h[None], frames[1:4]])

    # ---- stage B kernel: u_new (+ mixed trn) ----
    out_b = _run_kernel(p, cfg, mid, dt, L, interpret,
                        chain_kind="fb2b", wind=wind, mesh=mesh)

    # ---- composed stage B (re-gathered refreshed h_new) ----
    h_new_m = mid_h.reshape(-1, Kp)[p.sub_cell_src][..., :K].at[fc].set(
        h_new_s[fc])
    du, _ = tend_mod.compute_velocity_tendency(sub, cfg, h_new_m, u0,
                                               t + dt, wsub)
    u_new_s = u0 + dt * du
    if vmix:
        from omega_tpu.core.state import ModelState as _MS
        from omega_tpu.stepping.steppers import _mix
        trn_m = jnp.stack([
            mid[1 + l].reshape(-1, Kp)[p.sub_cell_src][..., :K]
            for l in range(L)]).at[:, fc].set(trn_s[:, fc])
        st_n = _mix(sub, cfg, _MS(h=h_new_s, u=u_new_s, tracers=trn_m),
                    dt)
        u_new_s, trn_s = st_n.u, st_n.tracers
    nfix = dict(h=h_new_s[fc], u=u_new_s[fe], tr=trn_s[:, fc])

    trn_fin = out_b[3:] if vmix else out_a[1:]
    out_fin = jnp.concatenate([out_a[:1], out_b[:3], trn_fin], axis=0)
    nf = frames.at[:, :, FR:FR + S, FR:FR + S].set(out_fin)
    return _refresh_frames(p, nf, nfix, K, Kp, L), nfix



def rk4_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                              interpret=None, wind=None):
    """One classic-RK4 step on the (frames, fix_vals) carry: four stage
    kernels (mesh/icos_mega.rk4_stage_chain), each followed by an
    in-frame refresh of the provisional and accumulator frames (the
    margins hold exactly one tendency-chain radius, so every stage
    re-establishes them — the composed stepper's stage-2 exchange,
    generalized).  The pole-fix rows advance on the fix submesh stage
    by stage, re-gathered from the refreshed frames at each boundary
    (mirrors stepping.steppers.rk4_step)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype)
    Kp = frames.shape[-1]
    B = 4 + L
    from omega_tpu.core import tendencies as tend_mod
    from omega_tpu.stepping.steppers import _RKA, _RKB, _RKC

    def sub_state(fr, fx):
        cflat = fr[0].reshape(-1, Kp)
        eflat = fr[1:4].reshape(-1, Kp)
        h = cflat[p.sub_cell_src][..., :K].at[
            p.fix_cells_local].set(fx["h"])
        u = eflat[p.sub_edge_src][..., :K].at[
            p.fix_edges_local].set(fx["u"])
        tr = jnp.stack([
            fr[4 + l].reshape(-1, Kp)[p.sub_cell_src][..., :K]
            for l in range(L)]).at[:, p.fix_cells_local].set(fx["tr"])
        return h, u, tr

    def fix_rows(h, u, tr):
        return dict(h=h[p.fix_cells_local],
                    u=u[p.fix_edges_local],
                    tr=tr[:, p.fix_cells_local])

    def paste_refresh(out_block, fx):
        nf = frames.at[:, :, FR:FR + p.S, FR:FR + p.S].set(out_block)
        return _refresh_frames(p, nf, fx, K, Kp, L)

    h0, u0, tr0 = sub_state(frames, fix)
    wsub = None if wind is None else wind[1]

    # ---- stage 1: k1 at the original state ----
    out = _run_kernel(p, cfg, frames, dt, L, interpret,
                      chain_kind="rk4s1", wind=wind, mesh=mesh)
    k = tend_mod.compute_all_tendencies(p.sub_mesh, cfg, h0, u0, tr0,
                                        t, wsub)
    ha = h0 + _RKB[0] * dt * k.dh
    ua = u0 + _RKB[0] * dt * k.du
    tra = tr0 * h0[None] + _RKB[0] * dt * k.dtr
    hp = h0 + _RKA[1] * dt * k.dh
    up = u0 + _RKA[1] * dt * k.du
    trp = (tr0 * h0[None] + _RKA[1] * dt * k.dtr) / hp[None]
    prov_fix = fix_rows(hp, up, trp)
    acc_fix = fix_rows(ha, ua, tra)
    prov = paste_refresh(out[:B], prov_fix)
    acc = paste_refresh(out[B:], acc_fix)

    # ---- stages 2-4 ----
    for stage in (2, 3, 4):
        stacked = jnp.concatenate([prov, frames, acc])
        out = _run_kernel(p, cfg, stacked, dt, L, interpret,
                          chain_kind=f"rk4s{stage}", wind=wind, mesh=mesh)
        hp, up, trp = sub_state(prov, prov_fix)
        ha, ua, tra = sub_state(acc, acc_fix)
        k = tend_mod.compute_all_tendencies(
            p.sub_mesh, cfg, hp, up, trp,
            t + _RKC[stage - 1] * dt, wsub)
        ha = ha + _RKB[stage - 1] * dt * k.dh
        ua = ua + _RKB[stage - 1] * dt * k.du
        tra = tra + _RKB[stage - 1] * dt * k.dtr
        if stage < 4:
            hp = h0 + _RKA[stage] * dt * k.dh
            up = u0 + _RKA[stage] * dt * k.du
            trp = (tr0 * h0[None] + _RKA[stage] * dt * k.dtr) / hp[None]
            prov_fix = fix_rows(hp, up, trp)
            acc_fix = fix_rows(ha, ua, tra)
            prov = paste_refresh(out[:B], prov_fix)
            acc = paste_refresh(out[B:], acc_fix)
        else:
            # operator-split vmix on the final state (rk4_step's _mix)
            from omega_tpu.core.state import ModelState as _MS
            from omega_tpu.stepping.steppers import _mix
            st_n = _mix(p.sub_mesh, cfg,
                        _MS(h=ha, u=ua, tracers=tra / ha[None]), dt)
            nfix = fix_rows(st_n.h, st_n.u, st_n.tracers)
            nf = paste_refresh(out, nfix)
    return nf, nfix


def split_patch_supported(mesh, cfg) -> bool:
    """Sphere fused split-explicit: the column-ssh velocity chain runs
    as a splitpre patch kernel, the 2-D barotropic work runs flat, and
    the thickness/tracer advance runs as a splitpost patch kernel (see
    split_patch_megastep_framed).  Wind/drag/vmix keep the composed
    split stepper (parity with megastep.split_supported)."""
    import dataclasses
    tc = cfg.tendencies
    return (cfg.ssh_formulation == "column"
            and supported(mesh, dataclasses.replace(
                cfg, ssh_formulation="stacked"))
            # center fluxes only (the flat phase + splitpost chain)
            and cfg.flux_thickness_type == "center"
            and cfg.flux_tracer_type == "center"
            and not cfg.vert_mix.enabled
            and not tc.wind_forcing and not tc.bottom_drag)


def _edge_frames(p, flat, K, Kp, dtype):
    """Flat (E, K) edge field -> (3, 10, SS, SS, Kp) content frames
    (natural grid + halo fills), the single-field form of
    _assemble_frames."""
    n, SS = p.n, p.SS
    NG = 10 * n * n
    grid = flat[:3 * NG].reshape(3, 10, n, n, K)
    fr = jnp.zeros((3, 10, SS, SS, K), dtype)
    fr = fr.at[:, :, FR + MH:FR + MH + n, FR + MH:FR + MH + n].set(grid)
    pos, src = p.fills["edge"]
    fr = fr.reshape(-1, K).at[pos].set(flat[src]).reshape(
        3, 10, SS, SS, K)
    if Kp != K:
        fr = jnp.pad(fr, ((0, 0),) * 4 + ((0, Kp - K),))
    return fr


def split_patch_megastep_framed(mesh, cfg, carry, t, dt, K, L,
                                n_subcycles=10, bt_drag=0.0,
                                interpret=None):
    """One split-explicit step on the (frames, fix_vals) carry
    (stepping/split.py semantics on the sphere):

      1. splitpre kernel — the full 3-D velocity tendency with the
         column free surface, emitted whole (du_out) and read back flat
         (kernel-output coordinate maps; pole rows recomputed composed
         on the fix submesh)
      2. FLAT 2-D phase — thickness-weighted mode split, frozen slow
         forcing, and the barotropic FB subcycles as a lax.scan over
         (E,1)/(C,1) fields (radius-1 stencils on one-lane arrays; the
         subcycles are global, so pole rows need no special handling)
      3. splitpost kernel — thickness/tracer advance with the transport
         velocity loaded into the frames' u channels; the new velocity
         u' + dt(G - Gbar) + ubar_final is pointwise flat and
         re-assembled into the u channels directly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    frames, fix = carry
    p = _prep(mesh, frames.dtype)
    Kp = frames.shape[-1]
    dtype = frames.dtype
    g = cfg.gravity
    from omega_tpu.core import tendencies as tend_mod
    from omega_tpu.core.state import ModelState
    from omega_tpu.ops import trisk
    from omega_tpu.stepping.split import _depth_avg_edge

    # ---- flat state (frames hold every element somewhere) ----
    cflat = frames[0].reshape(-1, Kp)
    eflat = frames[1:4].reshape(-1, Kp)
    h = jnp.where(p.cell_src_ok[:, None], cflat[p.cell_src][..., :K],
                  0.0).at[p.fix_cells_global].set(fix["h"])
    u = jnp.where(p.edge_src_ok[:, None], eflat[p.edge_src][..., :K],
                  0.0).at[p.fix_edges_global].set(fix["u"])
    tr = jnp.stack([
        jnp.where(p.cell_src_ok[:, None],
                  frames[4 + l].reshape(-1, Kp)[p.cell_src][..., :K],
                  0.0) for l in range(L)]).at[
        :, p.fix_cells_global].set(fix["tr"])

    # ---- 1. splitpre kernel: du_full ----
    du_fr = _run_kernel(p, cfg, frames, dt, L, interpret,
                        chain_kind="splitpre", mesh=mesh)
    # the kernel emits the UNGATED du accumulation; the composed path
    # masks every term (mask in {0,1}: mask*sum == sum of masked terms
    # bit-exactly), and dead seam-slot edges must read as 0, not as a
    # clamped-index garbage row
    mask = trisk.col(mesh, "edge_mask")          # (E, 1) or scalar 1.0
    du = du_fr.reshape(-1, Kp)[p.edge_src_out][..., :K]
    if not isinstance(mask, (int, float)):
        du = jnp.where(mask != 0, du, 0.0)
    du = jnp.where(p.edge_src_ok[:, None], du, 0.0)
    h_sub = h[p.sub_cells]
    u_sub = u[p.sub_edges]
    tr_sub = tr[:, p.sub_cells]
    du_s, _ = tend_mod.compute_velocity_tendency(p.sub_mesh, cfg, h_sub,
                                                 u_sub, t)
    fix_e_rows = p.sub_edges[p.fix_edges_local]
    du = du.at[fix_e_rows].set(du_s[p.fix_edges_local])

    # ---- 2. flat 2-D phase (mirrors split.py:87-148) ----
    h_edge = trisk.cell_mean_on_edge(mesh, h)
    h_edge_tot = jnp.sum(h_edge, axis=-1, keepdims=True)
    ubar = _depth_avg_edge(h_edge, u)
    uprime = u - ubar
    du_bar = _depth_avg_edge(h_edge, du)

    f_e = trisk.col(mesh, "f_edge")
    mask = trisk.col(mesh, "edge_mask")

    def fast(ub, ssh_s):
        out = (-g * trisk.grad_edge(mesh, ssh_s)
               + f_e * trisk.tangential_edge(mesh, ub))
        if bt_drag:
            out = out - bt_drag * ub
        return mask * out

    ssh = jnp.sum(h, axis=-1, keepdims=True) \
        - trisk.col(mesh, "bottom_depth")
    g_slow = du_bar - fast(ubar, ssh)
    dt_bt = dt / n_subcycles

    def subcycle(carry_, _):
        ub, ssh_s, acc = carry_
        ub = ub + dt_bt * (fast(ub, ssh_s) + g_slow)
        ssh_s = ssh_s - dt_bt * trisk.div_cell(mesh, h_edge_tot * ub)
        return (ub, ssh_s, acc + ub), None

    (ub_final, _, acc), _ = jax.lax.scan(
        subcycle, (ubar, ssh, jnp.zeros_like(ubar)), None,
        length=n_subcycles)
    ubar_avg = acc / n_subcycles

    u_new = (uprime + dt * (du - du_bar)) + ub_final
    u_trans = uprime + ubar_avg

    # ---- 3. splitpost kernel: h/tracer advance with u_trans ----
    ut_fr = _edge_frames(p, u_trans, K, Kp, dtype)
    out = _run_kernel(p, cfg, frames.at[1:4].set(ut_fr), dt, L,
                      interpret, chain_kind="splitpost", mesh=mesh)

    # pole-fix rows: composed advance on the submesh with the GLOBAL
    # transport velocity (the subcycles are global, so sub rows reuse
    # their exact values)
    ut_sub = u_trans[p.sub_edges]
    he_sub = trisk.cell_mean_on_edge(p.sub_mesh, h_sub)
    dh_sub = -trisk.div_cell(p.sub_mesh, he_sub * ut_sub)
    h_sub_new = h_sub + dt * dh_sub
    dtr_sub, _ = tend_mod.compute_tracer_tendency(
        p.sub_mesh, cfg, h_sub, ut_sub, tr_sub, he_sub, t,
        h_new=h_sub_new, dt=dt, flux_h_edge=he_sub)
    tr_sub_new = (tr_sub * h_sub[None] + dt * dtr_sub) / h_sub_new[None]
    nfix = dict(h=h_sub_new[p.fix_cells_local],
                u=u_new[p.fix_edges_global],
                tr=tr_sub_new[:, p.fix_cells_local])

    # ---- frames update: h/tr from the kernel, u from flat ----
    nf = frames.at[0, :, FR:FR + p.S, FR:FR + p.S].set(out[0])
    for l in range(L):
        nf = nf.at[4 + l, :, FR:FR + p.S, FR:FR + p.S].set(out[1 + l])
    nf = nf.at[1:4].set(_edge_frames(p, u_new, K, Kp, dtype))
    return _refresh_frames(p, nf, nfix, K, Kp, L), nfix


def unstack_frames(mesh, carry, K, L, state_cls, fct=False):
    """(frames, fix_vals) -> flat ModelState.  `fct` selects the FCT
    fix sets (the carry's fix rows live on them for FCT segments)."""
    frames, fix = carry
    p = _prep(mesh, frames.dtype, fct=fct)
    Kp = frames.shape[-1]
    cflat = frames[0].reshape(-1, Kp)
    eflat = frames[1:4].reshape(-1, Kp)
    if fct:
        fixc, fixe = p.fct_fix_cells_global, p.fct_fix_edges_global
        csrc, cok = p.fct_cell_src, p.fct_cell_src_ok
        esrc, eok = p.fct_edge_src, p.fct_edge_src_ok
    else:
        fixc, fixe = p.fix_cells_global, p.fix_edges_global
        csrc, cok = p.cell_src, p.cell_src_ok
        esrc, eok = p.edge_src, p.edge_src_ok

    def read(flat, src, ok, fixg, fix_rows):
        v = flat[src][..., :K]
        v = jnp.where(ok[:, None], v, 0.0)
        return v.at[fixg].set(fix_rows)

    h = read(cflat, csrc, cok, fixc, fix["h"])
    u = read(eflat, esrc, eok, fixe, fix["u"])
    tr = jnp.stack([
        read(frames[4 + l].reshape(-1, Kp), csrc, cok,
             fixc, fix["tr"][l]) for l in range(L)])
    return state_cls(h=h, u=u, tracers=tr)
