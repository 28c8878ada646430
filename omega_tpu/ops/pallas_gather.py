"""Pallas TPU kernels for unstructured TRiSK gathers.

On uniform planar meshes the roll path (ops/structured.py) eliminates
gathers entirely; on unstructured meshes (spheres, variable resolution)
the stencils remain index gathers, and XLA's row gather measured 10-15x
slower than streaming on v5e. These kernels implement the gather with
explicit per-row async DMA from HBM into VMEM scratch, double-buffered
across the stencil slots — the hand-scheduled alternative the SURVEY
plans for the hot path (SURVEY.md section 2.8 item 1).

Design: grid over blocks of BLOCK destination rows. The (N, M) index
array rides scalar prefetch (pltpu.PrefetchScalarGridSpec) so the kernel
can compute DMA source rows before the body runs; the source field stays
in HBM (pl.ANY) and rows are copied one at a time into a (2, K) VMEM
scratch with a 2-deep pipeline. Weights arrive as a VMEM block.

`gather_weighted_sum(idx, w, field)` == einsum('nj,njk->nk', w, field[idx])
(the div/curl/ke/tangential form); `gather_rows(idx, field)` == field[idx]
for a 1-D idx (the cell-pair form).

These kernels are EXPERIMENTAL: correctness is tested in interpreter mode
on CPU; enable on device via OMEGA_PALLAS_GATHER=1 once profiled.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256


def _gather_ws_kernel(idx_ref, w_ref, field_ref, out_ref, scratch, sem):
    """One grid step: BLOCK output rows, M slots each.

    idx_ref: scalar-prefetched (N, M) int32; w_ref: (BLOCK, M) VMEM;
    field_ref: (Nsrc, K) in HBM/ANY; out_ref: (BLOCK, K) VMEM;
    scratch: (2, K) VMEM; sem: 2 DMA semaphores.
    """
    b = pl.program_id(0)
    M = w_ref.shape[1]
    K = out_ref.shape[1]
    base = b * BLOCK

    def row_dma(slot, i, j):
        src = idx_ref[base + i, j]
        return pltpu.make_async_copy(
            field_ref.at[pl.ds(src, 1), :],
            scratch.at[pl.ds(slot, 1), :],
            sem.at[slot])

    # flat loop over BLOCK*M row fetches with 2-slot pipelining
    total = BLOCK * M
    row_dma(0, 0, 0).start()

    def body(t, acc):
        i, j = t // M, t % M
        slot = t % 2

        @pl.when(t + 1 < total)
        def _():
            tn = t + 1
            row_dma((t + 1) % 2, tn // M, tn % M).start()

        row_dma(slot, i, j).wait()
        contrib = w_ref[i, j] * scratch[slot, :]
        # accumulate into the output row
        prev = jnp.where(j == 0, jnp.zeros((K,), out_ref.dtype),
                         out_ref[i, :])
        out_ref[i, :] = prev + contrib
        return acc

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_ws_call(idx, w, field, *, interpret=False):
    N, M = idx.shape
    K = field.shape[-1]
    nblocks = (N + BLOCK - 1) // BLOCK
    npad = nblocks * BLOCK
    idx_p = jnp.zeros((npad, M), jnp.int32).at[:N].set(idx.astype(jnp.int32))
    w_p = jnp.zeros((npad, M), w.dtype).at[:N].set(w)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, M), lambda b, idx_ref: (b, 0),
                         memory_space=pltpu.VMEM),          # weights
            pl.BlockSpec(memory_space=pltpu.ANY),           # field (HBM)
        ],
        out_specs=pl.BlockSpec((BLOCK, K), lambda b, idx_ref: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K), field.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _gather_ws_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, K), field.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx_p, w_p, field)
    return out[:N]


def gather_weighted_sum(idx, w, field, interpret=None):
    """sum_j w[n, j] * field[idx[n, j]] -> (N, K) via Pallas DMA gather.

    field: (Nsrc, K) 2-D only (batch dims handled by callers via vmap).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_ws_call(idx, w, field, interpret=interpret)


def enabled() -> bool:
    return os.environ.get("OMEGA_PALLAS_GATHER", "0") in ("1", "true")
