"""All barotropic subcycles of the split-explicit step in ONE kernel.

The barotropic system of stepping/split.py is 2-D: (ubar, ssh) plus the
frozen forcing and column depth are 10 channels of (ny, nx) f32 — ~2.6 MB
at the 256^2 flagship, so the ENTIRE state of all M forward-backward
subcycles fits in VMEM at once. The composed lax.scan pays per-subcycle
launch/glue overhead and HBM round trips on tiny (E,1)/(C,1) arrays;
this kernel DMAs the stacked channels in once, runs the M subcycles as
an in-register fori_loop, and writes (ubar_final, ssh_final, <ubar>)
back out.

Because the whole doubly periodic domain is resident, the stencil rolls
ARE the topology — there is no tile halo and no creep: the kernel is
exact for any subcycle count (unlike the tiled mega-step whose ring
bounds the chain radius).

Fast-system semantics match split_forward_backward_step exactly:
    ub   += dt_bt * (mask*(-g*grad(ssh) + f_e*tang(ub) - r*ub) + g_slow)
    ssh  -= dt_bt * div(h_edge_tot * ub)
    acc  += ub
(reference analogue: the Omega-2 roadmap's split stepper,
doc/design/OmegaV1GoverningEqns.md:29; MPAS-O practice per Ringler et
al. 2013.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omega_tpu.ops import structured
from omega_tpu.ops.megastep import _apply, _table


def enabled() -> bool:
    v = os.environ.get("OMEGA_BT_KERNEL")
    if v is not None:
        return v in ("1", "true")
    return jax.default_backend() == "tpu"


def supported(mesh) -> bool:
    """Structured f-plane mesh with uniform geometry (the same uniformity
    the planar mega-step needs, plus a uniform f_edge for the barotropic
    Coriolis term)."""
    if not structured.enabled(mesh):
        return False
    need = ("dc_edge", "f_edge", "edge_mask")
    if any(structured.uniform_scalar(mesh, a) is None for a in need):
        return False
    if structured.uniform_scalar(mesh, "edge_mask") != 1.0:
        return False
    return all(_table(mesh, n) is not None
               for n in ("div", "cdiff", "tang"))


def _kernel(s_ref, o_ref, *, tabs, consts, ny, nx, M):
    (dt_bt, g, inv_dc, f_e, r_drag) = consts
    row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    even = (row % 2) == 0
    ap = lambda name, vals, pd: _apply(tabs[name], vals, even, pd)

    het = [s_ref[7 + i] for i in range(3)]
    gsl = [s_ref[4 + i] for i in range(3)]

    def subcycle(_, carry):
        ub0, ub1, ub2, ssh, a0, a1, a2 = carry
        ub = [ub0, ub1, ub2]
        gssh = ap("cdiff", [ssh], 3)
        tg = ap("tang", ub, 3)
        ub = [ub[i] + dt_bt * (-g * inv_dc * gssh[i] + f_e * tg[i]
                               - r_drag * ub[i] + gsl[i])
              for i in range(3)]
        dssh = ap("div", [het[i] * ub[i] for i in range(3)], 1)[0]
        ssh = ssh - dt_bt * dssh
        return (ub[0], ub[1], ub[2], ssh,
                a0 + ub[0], a1 + ub[1], a2 + ub[2])

    z = jnp.zeros_like(s_ref[3])
    out = jax.lax.fori_loop(
        0, M, subcycle,
        (s_ref[0], s_ref[1], s_ref[2], s_ref[3], z, z, z))
    for i in range(7):
        o_ref[i] = out[i]


@functools.partial(jax.jit, static_argnames=(
    "tabs", "consts", "ny", "nx", "M", "interpret"))
def _call(stacked, *, tabs, consts, ny, nx, M, interpret):
    kern = functools.partial(_kernel, tabs=dict(tabs), consts=consts,
                             ny=ny, nx=nx, M=M)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((7, ny, nx), stacked.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(stacked)


def bt_subcycles(mesh, ubar, ssh, g_slow, h_edge_tot, *, gravity, dt_bt,
                 n_subcycles, bt_drag=0.0, interpret=None):
    """Run all barotropic FB subcycles in one kernel.

    ubar/g_slow/h_edge_tot: (E, 1); ssh: (C, 1). Returns
    (ub_final (E,1), ssh_final (C,1), ubar_avg (E,1)) — identical to the
    lax.scan in split_forward_backward_step on a single device."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nx, ny = mesh.structured_nx, mesh.structured_ny
    us = lambda a: structured.uniform_scalar(mesh, a)
    consts = (float(dt_bt), float(gravity), 1.0 / us("dc_edge"),
              us("f_edge"), float(bt_drag))
    names = ("div", "cdiff", "tang")
    tabs = tuple((n, _table(mesh, n)) for n in names)

    e2 = lambda x: x[:, 0].reshape(3, ny, nx)
    stacked = jnp.concatenate([
        e2(ubar), ssh[:, 0].reshape(1, ny, nx), e2(g_slow),
        e2(h_edge_tot)], axis=0)
    out = _call(stacked, tabs=tabs, consts=consts, ny=ny, nx=nx,
                M=int(n_subcycles), interpret=interpret)
    ub_final = out[0:3].reshape(3 * ny * nx, 1)
    ssh_final = out[3].reshape(ny * nx, 1)
    ubar_avg = (out[4:7] / n_subcycles).reshape(3 * ny * nx, 1)
    return ub_final, ssh_final, ubar_avg
