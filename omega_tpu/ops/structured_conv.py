"""Structured stencils as MXU convolutions (experimental).

The roll path executes an S-slot stencil as S shifted slab reads; XLA's
fusion splits beyond ~10 inputs, so wide stencils (tangential: 30 terms)
re-materialize intermediates and run well off the streaming roofline.
This module lowers a whole stencil to ONE `lax.conv_general_dilated`:

  * the odd-row stagger is absorbed by treating a 2-row supercell as the
    spatial unit: grid (ny/2, nx), channels = element-type x row-parity
  * the shift table (structured._decompose) becomes a small HWIO kernel
  * periodic boundaries via wrap-padding the (kh-1, kw-1) halo
  * K rides the conv batch dimension

One input read + one output write + tiny kernel -> the MXU does the
gather arithmetic. Gated behind OMEGA_CONV_STENCIL for A/B benching
against the roll path.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omega_tpu.ops import structured

_NPER = structured._NPER

_CONV_CACHE: dict = {}


def enabled() -> bool:
    """Conv lowering on TPU by default (measured +29% over the roll path
    at 256^2 x 100 on v5e); rolls elsewhere. OMEGA_CONV_STENCIL=1/0
    forces it on/off."""
    mode = os.environ.get("OMEGA_CONV_STENCIL", "auto")
    if mode in ("1", "true"):
        return True
    if mode in ("0", "false"):
        return False
    return jax.default_backend() == "tpu"


def conv_kernel_from_table(mesh, name: str):
    """(kernel (kh, kw, cin, cout), dy0, dx0) for a cached stencil table."""
    key = (mesh.structured_nx, mesh.structured_ny, mesh.structured_dc,
           "conv:" + name)
    if key in _CONV_CACHE:
        return _CONV_CACHE[key]
    tab_key = (mesh.structured_nx, mesh.structured_ny, mesh.structured_dc,
               name)
    tab, dst_class, src_class = structured._TABLE_CACHE[tab_key]
    ps, pd = _NPER[src_class], _NPER[dst_class]

    # supercell displacements per (entry, p_dst)
    entries = []
    for (t_dst, t_src, dj, di_e, di_o, w) in tab:
        for p_dst in (0, 1):
            jj = p_dst + dj
            dy = jj // 2            # floor division handles negatives
            p_src = jj % 2
            dx = di_e if p_dst == 0 else di_o
            cin = t_src * 2 + p_src
            cout = t_dst * 2 + p_dst
            entries.append((dy, dx, cin, cout, w))
    dys = [e[0] for e in entries]
    dxs = [e[1] for e in entries]
    dy0, dy1 = min(dys), max(dys)
    dx0, dx1 = min(dxs), max(dxs)
    kh, kw = dy1 - dy0 + 1, dx1 - dx0 + 1
    kernel = np.zeros((kh, kw, 2 * ps, 2 * pd), np.float64)
    for (dy, dx, cin, cout, w) in entries:
        # conv output[y] = sum_k kernel[k] * in[y + k - pad]; our semantic
        # is out[y] = in[y + dy], so the kernel index is dy - dy0
        kernel[dy - dy0, dx - dx0, cin, cout] += w
    _CONV_CACHE[key] = (kernel, dy0, dx0, ps, pd)
    return _CONV_CACHE[key]


def _to_conv_layout(field, ps: int, nx: int, ny: int):
    """(..., N, K) -> (K(+batch), ny/2, nx, 2*ps)."""
    K = field.shape[-1]
    lead = field.shape[:-2]
    g = field.reshape(lead + (ps, ny // 2, 2, nx, K))
    # -> (lead..., K, ny2, nx, ps, 2)
    ndim = g.ndim
    perm = tuple(range(len(lead))) + (ndim - 1, len(lead) + 1,
                                      len(lead) + 3, len(lead),
                                      len(lead) + 2)
    g = g.transpose(perm)
    g = g.reshape(lead + (K, ny // 2, nx, 2 * ps))
    if lead:
        g = g.reshape((int(np.prod(lead)) * K, ny // 2, nx, 2 * ps))
    return g


def _from_conv_layout(out, pd: int, nx: int, ny: int, K: int, lead):
    """(B, ny/2, nx, 2*pd) -> (..., N, K)."""
    if lead:
        out = out.reshape(lead + (K, ny // 2, nx, pd, 2))
    else:
        out = out.reshape((K, ny // 2, nx, pd, 2))
    n = out.ndim
    # -> (lead..., pd, ny2, 2, nx, K)
    perm = tuple(range(len(lead))) + (n - 2, len(lead) + 1, n - 1,
                                      len(lead) + 2, len(lead))
    out = out.transpose(perm)
    return out.reshape(lead + (pd * ny * nx, K))


_GROUPED = os.environ.get("OMEGA_CONV_GROUPED", "0") == "1"


def apply_stencil_conv(mesh, name: str, field):
    """Evaluate the named stencil via one conv (semantics identical to
    structured.apply_stencil for the same table)."""
    if _GROUPED:
        return _apply_grouped(mesh, name, field)
    kernel, dy0, dx0, ps, pd = conv_kernel_from_table(mesh, name)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    K = field.shape[-1]
    lead = field.shape[:-2]
    x = _to_conv_layout(field, ps, nx, ny)        # (B, ny2, nx, 2ps)
    kh, kw = kernel.shape[:2]
    x = _wrap_pad(x, dy0, kh, axis=1)
    x = _wrap_pad(x, dx0, kw, axis=2)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, field.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=field.dtype)
    return _from_conv_layout(out, pd, nx, ny, K, lead)


def _apply_grouped(mesh, name: str, field):
    """Variant with K as feature groups: features = K * types * parity
    (~600 wide — full lane utilization vs 6 in the batch-K form)."""
    kernel, dy0, dx0, ps, pd = conv_kernel_from_table(mesh, name)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    ny2 = ny // 2
    K = field.shape[-1]
    lead = field.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    # (..., T, ny2, p, nx, K) -> (B, ny2, nx, K, T, p) -> (B, ny2, nx, K*2T)
    g = field.reshape(lead + (ps, ny2, 2, nx, K))
    nl = len(lead)
    g = g.transpose(tuple(range(nl)) + (nl + 1, nl + 3, nl + 4, nl, nl + 2))
    x = g.reshape((B, ny2, nx, K * 2 * ps))
    kh, kw = kernel.shape[:2]
    x = _wrap_pad(x, dy0, kh, axis=1)
    x = _wrap_pad(x, dx0, kw, axis=2)
    kg = jnp.asarray(np.tile(kernel, (1, 1, 1, K)), field.dtype)
    out = jax.lax.conv_general_dilated(
        x, kg, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=K,
        preferred_element_type=field.dtype)
    # (B, ny2, nx, K*2pd) -> (..., T, ny, nx, K) -> (..., N, K)
    out = out.reshape(lead + (ny2, nx, K, pd, 2))
    out = out.transpose(tuple(range(nl)) + (nl + 3, nl, nl + 4, nl + 1,
                                            nl + 2))
    return out.reshape(lead + (pd * ny * nx, K))


def pair_enabled() -> bool:
    return os.environ.get("OMEGA_CONV_PAIR", "0") == "1"


def pair_kernel(mesh, name_a: str, name_b: str):
    """Merged kernel for two stencils over the SAME source class: one conv
    with concatenated output channels (halves the transpose+conv count of
    cell/vertex pair reads, the most frequent primitive in the step)."""
    key = (mesh.structured_nx, mesh.structured_ny, mesh.structured_dc,
           f"conv:{name_a}+{name_b}")
    if key in _CONV_CACHE:
        return _CONV_CACHE[key]
    ka, dy0a, dx0a, psa, pda = conv_kernel_from_table(mesh, name_a)
    kb, dy0b, dx0b, psb, pdb = conv_kernel_from_table(mesh, name_b)
    assert psa == psb
    dy0 = min(dy0a, dy0b)
    dx0 = min(dx0a, dx0b)
    kh = max(dy0a + ka.shape[0], dy0b + kb.shape[0]) - dy0
    kw = max(dx0a + ka.shape[1], dx0b + kb.shape[1]) - dx0
    kernel = np.zeros((kh, kw, 2 * psa, 2 * (pda + pdb)), np.float64)
    kernel[dy0a - dy0:dy0a - dy0 + ka.shape[0],
           dx0a - dx0:dx0a - dx0 + ka.shape[1], :, :2 * pda] = ka
    kernel[dy0b - dy0:dy0b - dy0 + kb.shape[0],
           dx0b - dx0:dx0b - dx0 + kb.shape[1], :, 2 * pda:] = kb
    _CONV_CACHE[key] = (kernel, dy0, dx0, psa, pda, pdb)
    return _CONV_CACHE[key]


def apply_pair_conv(mesh, name_a: str, name_b: str, field):
    """(stencil_a(field), stencil_b(field)) in one conv."""
    kernel, dy0, dx0, ps, pda, pdb = pair_kernel(mesh, name_a, name_b)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    K = field.shape[-1]
    lead = field.shape[:-2]
    x = _to_conv_layout(field, ps, nx, ny)
    kh, kw = kernel.shape[:2]
    x = _wrap_pad(x, dy0, kh, axis=1)
    x = _wrap_pad(x, dx0, kw, axis=2)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, field.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=field.dtype)
    a = _from_conv_layout(out[..., :2 * pda], pda, nx, ny, K, lead)
    b = _from_conv_layout(out[..., 2 * pda:], pdb, nx, ny, K, lead)
    return a, b


def _wrap_pad(x, d0: int, klen: int, axis: int):
    """Periodic halo so a VALID conv computes out[y] = sum_k in[y + d0 + k]:
    roll so index 0 lands on d0, then wrap-extend the tail by klen - 1."""
    if d0:
        x = jnp.roll(x, -d0, axis=axis)
    if klen > 1:
        head = jax.lax.slice_in_dim(x, 0, klen - 1, axis=axis)
        x = jnp.concatenate([x, head], axis=axis)
    return x
