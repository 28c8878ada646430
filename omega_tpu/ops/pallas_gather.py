"""Windowed Pallas gather: unstructured TRiSK stencils on the MXU.

On unstructured meshes (spheres, coastal files) the stencils are index
gathers, and XLA's row gather measured ~10x slower than streaming on
v5e. This kernel exploits bounded index bandwidth instead of fighting
random access: after RCM renumbering (mesh/reorder.py) every block of
256 consecutive destinations reads sources from a window of a few
hundred rows. Per block the kernel

  1. DMAs the source window [base_b, base_b + W) from HBM into VMEM
     (one big contiguous copy — no per-row latency),
  2. builds a weighted one-hot matrix P (BLOCK, W) from the in-window
     relative indices: P = sum_j w[:, j] * onehot(rel[:, j]),
  3. computes the gather as the MXU matmul  out = P @ window.

The one-hot matmul turns scattered reads into a dense contraction —
the systolic array does the "gather". Tables (per-block window bases,
relative indices, weights, W) are built on host at mesh construction
(trisk.warm_gather) and cached under the mesh's static `gather_key`
metadata, so lookups work inside jit where mesh leaves are tracers.

Enabled by default on TPU for warmed meshes; opt out with
OMEGA_PALLAS_GATHER=0.
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
_MAX_W = 6144       # VMEM guard: window + P must fit comfortably

_TABLES: dict = {}  # (gather_key, name) -> GatherTable


class GatherTable:
    """Host-built windowed-gather plan for one stencil."""

    def __init__(self, idx, weights, nsrc: int):
        idx = np.asarray(idx, np.int64)
        if idx.ndim == 1:
            idx = idx[:, None]
        w = np.asarray(weights, np.float64)
        if w.ndim == 1:
            w = w[:, None]
        N, M = idx.shape
        nb = -(-N // BLOCK)
        npad = nb * BLOCK
        idx_p = np.zeros((npad, M), np.int64)
        w_p = np.zeros((npad, M), np.float64)
        idx_p[:N] = idx
        w_p[:N] = w
        # zero-weight slots (padding) may point anywhere; retarget to 0
        idx_p = np.where(w_p != 0.0, idx_p, 0)

        lo_b = np.zeros(nb, np.int64)
        hi_b = np.zeros(nb, np.int64)
        for b in range(nb):
            blk = idx_p[b * BLOCK:(b + 1) * BLOCK]
            wb = w_p[b * BLOCK:(b + 1) * BLOCK]
            valid = blk[wb != 0.0]
            lo_b[b] = int(valid.min()) if valid.size else 0
            hi_b[b] = int(valid.max()) if valid.size else 0
        # W is an 8-multiple (VMEM scratch tiling); base offsets need no
        # alignment (verified: sublane-dim DMA offsets are unconstrained)
        W = -(-int((hi_b - lo_b).max() + 1) // 8) * 8
        if W > min(_MAX_W, nsrc):
            raise ValueError(
                f"gather window {W} too large (> {min(_MAX_W, nsrc)}); "
                f"renumber the mesh (mesh.reorder.reorder_mesh, "
                f"method='rcm')")
        bases = np.maximum(0, np.minimum(lo_b, nsrc - W)).astype(np.int32)
        rel = idx_p - bases.repeat(BLOCK)[:, None]
        # zero-weight (padding) slots may target any in-window row
        rel = np.where(w_p != 0.0, rel, 0)
        assert rel.min() >= 0 and rel.max() < W
        self.n = N
        self.nsrc = nsrc
        self.nblocks = nb
        self.window = W
        self.bases = jnp.asarray(bases)
        self.rel = jnp.asarray(rel.astype(np.int32))
        self.w = jnp.asarray(w_p)


def enabled() -> bool:
    """Default OFF: measured on v5e at icos48 x 100 the one-hot matmul
    amplifies work by ~window/M (39.3 vs 25.6 ms/step against XLA's
    gather), because the HIGHEST-precision MXU contraction triples the
    FLOPs and the P build costs N*window writes. The kernel is kept (and
    tested) as the scaffold for a future in-window vector-gather variant;
    enable explicitly with OMEGA_PALLAS_GATHER=1."""
    return os.environ.get("OMEGA_PALLAS_GATHER", "0") in ("1", "true")


def put(mesh, name: str, table: GatherTable) -> None:
    _TABLES[(mesh.gather_key, name)] = table


def get(mesh, name: str):
    if getattr(mesh, "gather_key", 0) == 0:
        return None
    return _TABLES.get((mesh.gather_key, name))


def _kernel(base_ref, rel_ref, w_ref, field_ref, out_ref, window, sem, *,
            W):
    b = pl.program_id(0)
    dma = pltpu.make_async_copy(field_ref.at[pl.ds(base_ref[b], W), :],
                                window, sem)
    dma.start()
    M = rel_ref.shape[1]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, W), 1)
    P = None
    for j in range(M):
        hit = (iota_w == rel_ref[:, j:j + 1]).astype(w_ref.dtype)
        term = w_ref[:, j:j + 1] * hit
        P = term if P is None else P + term
    dma.wait()
    # HIGHEST: f32-accurate MXU passes — the one-hot contraction must
    # not round the gathered values (bf16 default loses ~3 digits)
    out_ref[...] = jax.lax.dot(P, window[...],
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nblocks", "window", "n",
                                             "interpret"))
def _call(bases, rel, w, field, *, nblocks, window, n, interpret=False):
    # DMA lane extents must be 128-aligned; pad K and slice the result
    K0 = field.shape[-1]
    Kp = -(-K0 // 128) * 128
    if Kp != K0:
        field = jnp.pad(field, ((0, 0), (0, Kp - K0)))
    K = field.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, rel.shape[1]), lambda b, base: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, rel.shape[1]), lambda b, base: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((BLOCK, K), lambda b, base: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((window, K), field.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, W=window),
        out_shape=jax.ShapeDtypeStruct((nblocks * BLOCK, K), field.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(bases, rel, w.astype(field.dtype), field)
    return out[:n, :K0]


def apply(table: GatherTable, field, interpret=None):
    """sum_j w[n, j] * field[..., idx[n, j], :] -> (..., N, K)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if field.ndim == 2:
        return _call(table.bases, table.rel, table.w, field,
                     nblocks=table.nblocks, window=table.window,
                     n=table.n, interpret=interpret)
    # fold leading dims with a python loop (L is small)
    lead = field.shape[:-2]
    flat = field.reshape((-1,) + field.shape[-2:])
    outs = [_call(table.bases, table.rel, table.w, flat[i],
                  nblocks=table.nblocks, window=table.window, n=table.n,
                  interpret=interpret)
            for i in range(flat.shape[0])]
    return jnp.stack(outs).reshape(lead + outs[0].shape)
