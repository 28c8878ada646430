"""Hand-scheduled Pallas TPU kernel for structured stencils.

The conv lowering (structured_conv.py) reads the input once but pays for
XLA's conv machinery at 6 feature channels (~5% MXU lane utilization).
This kernel streams the stencil directly on the VPU with the layout the
hardware wants:

    (C, K, ny/2, nx)   C = element-type x row-parity channels,
                       nx on the LANE axis, K x ny/2 tiled on sublanes

Each grid step owns a (bk, bh) tile of (K, ny/2) for ALL channels. Column
shifts become lane rolls of a full nx row — which also implements the
periodic wrap exactly, so no x halo is needed. Row shifts read a y halo
of max |dy| rows wrap-padded by the caller. The stencil is unrolled into
scalar-weight FMAs over (bk, bh, nx) slabs: every input byte is read from
HBM once, every output byte written once — streaming speed-of-light for
arbitrary stencil widths (the 30-term tangential costs the same traffic
as a 2-term pair).

Semantics identical to structured.apply_stencil; exactness tested in
interpreter mode, selected on TPU via OMEGA_PALLAS_STENCIL=1.
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
from omega_tpu.ops.structured_conv import conv_kernel_from_table

_NPER = structured._NPER


def enabled() -> bool:
    """Default ON on TPU (validated on hardware, 26.7 vs 32.2 ms/step at
    256^2x100 against the conv path); opt out with
    OMEGA_PALLAS_STENCIL=0. CPU stays on the roll path unless forced."""
    v = os.environ.get("OMEGA_PALLAS_STENCIL")
    if v is not None:
        return v in ("1", "true")
    import jax
    return jax.default_backend() == "tpu"


def kernel_kind() -> str:
    """'dma' (transpose-free, pallas_stencil_dma.py) or 'channel' (the
    nx-on-lanes kernel in this file)."""
    return os.environ.get("OMEGA_PALLAS_KERNEL", "dma")


def _plan(mesh, name: str):
    """[(dy, dx, cin, cout, w)] with dy relative (not offset), plus pads."""
    kernel, dy0, dx0, ps, pd = conv_kernel_from_table(mesh, name)
    kh, kw, cin, cout = kernel.shape
    terms = []
    for iy in range(kh):
        for ix in range(kw):
            for ci in range(cin):
                for co in range(cout):
                    w = kernel[iy, ix, ci, co]
                    if w != 0.0:
                        terms.append((iy + dy0, ix + dx0, ci, co, float(w)))
    dys = [t[0] for t in terms]
    return terms, min(dys), max(dys), ps, pd


def _stencil_kernel(in_ref, out_ref, *, terms, dy_min, ny2):
    """in_ref: (cin, bk, ny2 + dy_range, nx); out_ref: (cout, bk, ny2, nx)."""
    acc = {}
    for (dy, dx, ci, co, w) in terms:
        row0 = dy - dy_min
        slab = in_ref[ci, :, row0:row0 + ny2, :]
        if dx:
            nx = slab.shape[-1]
            slab = pltpu.roll(slab, (-dx) % nx, 2)
        contrib = w * slab
        acc[co] = contrib if co not in acc else acc[co] + contrib
    for co, val in acc.items():
        out_ref[co, :, :, :] = val


@functools.partial(jax.jit,
                   static_argnames=("terms", "dy_min", "dy_max", "ps", "pd",
                                    "nx", "ny2", "interpret"))
def _call(x, *, terms, dy_min, dy_max, ps, pd, nx, ny2, interpret):
    """x: (2*ps, K, ny2 + dy_range, nx) wrap-padded by the caller;
    out (2*pd, K, ny2, nx). Grid over K blocks; each block spans the full
    (ny2, nx) plane so column rolls wrap exactly."""
    K = x.shape[1]
    # VMEM budget: (in + out) * bk * ny2 * nx * 4B * 2 (pipeline). The
    # scoped-vmem limit is 16MB; Mosaic adds pad/stack overhead on top of
    # the raw block bytes, so budget well under it (measured: 14e6 OOMs at
    # 256^2 x 100 by ~4MB; 8e6 fits).
    budget = float(os.environ.get("OMEGA_PALLAS_VMEM", 8e6))
    plane = (2 * ps + 2 * pd) * (ny2 + dy_max - dy_min) * nx * 4 * 2
    bk = max(1, min(K, int(budget // max(plane, 1))))
    while K % bk:
        bk -= 1
    grid = (K // bk,)
    out = pl.pallas_call(
        functools.partial(_stencil_kernel, terms=terms, dy_min=dy_min,
                          ny2=ny2),
        out_shape=jax.ShapeDtypeStruct((2 * pd, K, ny2, nx), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(
            (2 * ps, bk, ny2 + dy_max - dy_min, nx),
            lambda gk: (0, gk, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (2 * pd, bk, ny2, nx), lambda gk: (0, gk, 0, 0),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
    return out


def apply_stencil_pallas(mesh, name: str, field, interpret=None):
    """structured.apply_stencil semantics via the Pallas streaming kernel.

    field: (..., N, K) -> (..., N_dst, K)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    terms, dy_min, dy_max, ps, pd = _plan(mesh, name)
    nx, ny = mesh.structured_nx, mesh.structured_ny
    ny2 = ny // 2
    K = field.shape[-1]
    lead = field.shape[:-2]
    B = int(np.prod(lead)) if lead else 1

    # (..., T, ny2, p, nx, K) -> (C=2T, B*K, ny2, nx)
    g = field.reshape(lead + (ps, ny2, 2, nx, K))
    nl = len(lead)
    g = g.transpose((nl, nl + 2) + tuple(range(nl)) + (nl + 4, nl + 1,
                                                       nl + 3))
    g = g.reshape((2 * ps, B * K, ny2, nx))

    # wrap-pad the y axis so in[..., y + dy - dy_min, :] is valid
    parts = []
    if dy_min < 0:
        parts.append(g[:, :, ny2 + dy_min:, :])
    parts.append(g)
    if dy_max > 0:
        parts.append(g[:, :, :dy_max, :])
    gp = jnp.concatenate(parts, axis=2) if len(parts) > 1 else g

    out = _call(gp, terms=tuple(terms), dy_min=dy_min, dy_max=dy_max,
                ps=ps, pd=pd, nx=nx, ny2=ny2, interpret=interpret)
    # (2pd, B*K, ny2, nx) -> (..., N_dst, K)
    out = out.reshape((pd, 2) + lead + (K, ny2, nx))
    out = out.transpose((0,) + tuple(range(2, 2 + nl)) + (3 + nl, 1, 4 + nl,
                                                          2 + nl))
    # now (pd, lead..., ny2, p, nx, K)
    out = jnp.moveaxis(out, 0, nl)
    return out.reshape(lead + (pd * ny * nx, K))