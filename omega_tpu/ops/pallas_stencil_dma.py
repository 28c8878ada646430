"""Transpose-free Pallas stencil kernel (lanes on K, manual DMA).

The channel-layout kernel (pallas_stencil.py) puts nx on the lane axis,
which forces a (N, K) -> (C, K, ny2, nx) transpose around EVERY call —
measured to cost as much as the stencil itself (per-pass ~0.7 ms vs a
~0.13 ms HBM floor at 256^2 x 100). This kernel keeps the model's native
layout: field (ps*ny*nx, K) reshapes FREE to (ps, ny, nx, K) with K on
lanes; the periodic wrap is materialized ONCE per call by padding ry
rows and rx columns (one cheap copy), after which every stencil term is
a pure shifted SLICE of the padded array — no rolls, no transposes.

Row blocks are streamed through VMEM with double-buffered manual DMA
(the guide's pipeline pattern): input and output live in ANY (HBM)
space, a fori_loop prefetches block i+1 while computing block i, and
each output row block is DMA'd back as soon as it is produced. The
parity-staggered column shifts of the hex lattice become a row-parity
select between two slices.

Semantics identical to structured.apply_stencil; selected on TPU via
OMEGA_PALLAS_KERNEL=dma.
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

_NPER = structured._NPER


def _plan(mesh, name: str):
    """Static term list [(dj, di_e, di_o, ci, co, w)] from the structured
    shift table, plus (ps, pd, ry, rx)."""
    key = (mesh.structured_nx, mesh.structured_ny, mesh.structured_dc, name)
    tab, dst_class, src_class = structured._TABLE_CACHE[key][:3]
    ps, pd = _NPER[src_class], _NPER[dst_class]
    terms = []
    ry = rx = 0
    for (t_dst, t_src, dj, di_e, di_o, w) in tab:
        terms.append((int(dj), int(di_e), int(di_o), int(t_src),
                      int(t_dst), float(w)))
        ry = max(ry, abs(dj))
        rx = max(rx, abs(di_e), abs(di_o))
    return tuple(terms), ps, pd, ry, rx


def _kernel(in_hbm, out_hbm, *, terms, ps, pd, B, ny, nx, K,
            ry, rx, by, nblocks):
    """in_hbm: (B*ps, ny + 2*ry, nx + 2*rx, K); out: (B*pd, ny, nx, K)."""

    def body(in_slab, out_slab, in_sem, out_sem):
        def in_dma(slot, b):
            return pltpu.make_async_copy(
                in_hbm.at[:, pl.ds(b * by, by + 2 * ry)],
                in_slab.at[slot], in_sem.at[slot])

        def out_dma(slot, b):
            return pltpu.make_async_copy(
                out_slab.at[slot], out_hbm.at[:, pl.ds(b * by, by)],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def loop(b, _):
            cur = b % 2
            nxt = (b + 1) % 2

            @pl.when(b + 1 < nblocks)
            def _():
                in_dma(nxt, b + 1).start()

            in_dma(cur, b).wait()

            # destination-row parity of the hex stagger: global row index
            # of output row iy is b*by + iy
            row = b * by + jax.lax.broadcasted_iota(
                jnp.int32, (by, nx, K), 0)
            even = (row % 2) == 0

            # the previous use of this out slot must have drained
            @pl.when(b >= 2)
            def _():
                out_dma(cur, b - 2).wait()

            for co in range(B * pd):
                acc = None
                for (dj, di_e, di_o, ci, co_t, w) in terms:
                    if co_t != co % pd:
                        continue
                    c_in = (co // pd) * ps + ci
                    y0 = dj + ry
                    xa = rx + di_e
                    slab = in_slab[cur, c_in, y0:y0 + by, xa:xa + nx, :]
                    if di_e != di_o:
                        xb = rx + di_o
                        slab = jnp.where(
                            even, slab,
                            in_slab[cur, c_in, y0:y0 + by, xb:xb + nx, :])
                    contrib = w * slab
                    acc = contrib if acc is None else acc + contrib
                out_slab[cur, co] = acc

            out_dma(cur, b).start()

        jax.lax.fori_loop(0, nblocks, loop, None)
        # drain the last two output DMAs
        @pl.when(nblocks >= 2)
        def _():
            out_dma((nblocks - 2) % 2, nblocks - 2).wait()
        out_dma((nblocks - 1) % 2, nblocks - 1).wait()

    pl.run_scoped(
        body,
        in_slab=pltpu.VMEM((2, B * ps, by + 2 * ry, nx + 2 * rx, K),
                           in_hbm.dtype),
        out_slab=pltpu.VMEM((2, B * pd, by, nx, K), in_hbm.dtype),
        in_sem=pltpu.SemaphoreType.DMA((2,)),
        out_sem=pltpu.SemaphoreType.DMA((2,)),
    )


def _pick_by(ny, nx, K, ps, pd, B, ry, rx):
    """Largest row-block size whose double-buffered slabs fit VMEM."""
    budget = float(os.environ.get("OMEGA_PALLAS_VMEM", 8e6))
    Kp = -(-K // 128) * 128
    nxp = nx + 2 * rx
    by = ny
    while by > 1:
        if ny % by == 0:
            bytes_ = 2 * 4 * Kp * (B * ps * (by + 2 * ry) * nxp
                                   + B * pd * by * nx)
            if bytes_ <= budget:
                return by
        by -= 1
    return 1


@functools.partial(jax.jit, static_argnames=("terms", "ps", "pd", "B",
                                             "ny", "nx", "ry", "rx",
                                             "interpret"))
def _call(gp, *, terms, ps, pd, B, ny, nx, ry, rx, interpret):
    K = gp.shape[-1]
    by = _pick_by(ny, nx, K, ps, pd, B, ry, rx)
    nblocks = ny // by
    out = pl.pallas_call(
        functools.partial(_kernel, terms=terms, ps=ps, pd=pd, B=B,
                          ny=ny, nx=nx, K=K, ry=ry, rx=rx, by=by,
                          nblocks=nblocks),
        out_shape=jax.ShapeDtypeStruct((B * pd, ny, nx, K), gp.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        interpret=interpret,
    )(gp)
    return out


def apply_stencil_dma(mesh, name: str, field, interpret=None):
    """structured.apply_stencil semantics; field (..., N_src, K)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    terms, ps, pd, ry, rx = _plan(mesh, name)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    K = field.shape[-1]
    lead = field.shape[:-2]
    B = int(np.prod(lead)) if lead else 1

    g = field.reshape((B * ps, ny, nx, K))
    # periodic wrap materialized once: ry rows then rx columns
    if ry:
        g = jnp.concatenate([g[:, ny - ry:], g, g[:, :ry]], axis=1)
    if rx:
        g = jnp.concatenate([g[:, :, nx - rx:], g, g[:, :, :rx]], axis=2)
    # DMA slices need the lane (K) extent 128-aligned; the HBM memref is
    # lane-padded anyway, so this costs only the explicit zero fill
    Kp = -(-K // 128) * 128
    if Kp != K:
        g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, Kp - K)))

    out = _call(g, terms=terms, ps=ps, pd=pd, B=B, ny=ny, nx=nx,
                ry=ry, rx=rx, interpret=interpret)
    if Kp != K:
        out = out[..., :K]
    return out.reshape(lead + (pd * ny * nx, K))
