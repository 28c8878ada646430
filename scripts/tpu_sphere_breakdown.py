"""Sphere mega-step cost breakdown on hardware.

The BENCH_NOTES NOP-kernel diagnostic lumps everything outside the
chain evaluation into one 6.9 ms "DMA+glue" number.  This script
separates the framed step into its three components, each timed as a
min-over-reps 20-iteration scan (the only protocol that is reliable
through the axon tunnel; relative comparisons within one process):

  kernel   — _run_kernel on fixed frames (slab DMA + chain compute)
  submesh  — the composed FB step on the ~300-cell pole-fix submesh
  refresh  — the in-frame halo refill / fix scatter / hole re-zero

plus the full framed step for reference.  Run with the same env knobs
as the bench (OMEGA_PATCH_TILE / OMEGA_PATCH_K).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.core.state import ModelState as MS
from omega_tpu.mesh.icos_patches import patch_icos_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.ops import patch_megastep as pm
from omega_tpu.stepping.steppers import forward_backward_step

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32
n = int(os.environ.get("OMEGA_BENCH_SUBDIV", 48))
K, L = 100, 2

mesh = patch_icos_mesh(spherical_icos_mesh(n), n).astype(dtype).device_put()
cfg = ModelConfig(nvertlayers=K, ntracers=L,
                  tendencies=TendencyConfig(visc_del2=1.0e3,
                                            visc_del4=1.0e9))
ssh = np.sin(2 * np.asarray(mesh.lat_cell)) * np.cos(np.asarray(mesh.lon_cell))
d0 = float(np.asarray(mesh.bottom_depth)[0])
h = jnp.asarray((d0 + ssh[:, None]) / K, dtype) * jnp.ones((1, K), dtype)
st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K), dtype),
                tracers=10.0 + jnp.zeros((L, mesh.ncells, K), dtype))

p = pm._prep(mesh, dtype)
frames, fix = pm.stack_frames(mesh, cfg, st)
dt = 30.0
nsteps = 20


def timed(name, fn, *args):
    j = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(j(*args))
    comp = time.perf_counter() - t0
    el = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = jax.block_until_ready(j(*args))
        el = min(el, time.perf_counter() - t0)
    print(f"[{name}] {el / nsteps * 1e3:.2f} ms/iter (compile {comp:.0f}s)",
          flush=True)
    return out


# 1. full framed step
def full(carry):
    def body(c, _):
        cr, t = c
        cr = pm.fb_patch_megastep_framed(mesh, cfg, cr, t, dt, K=K, L=L)
        return (cr, t + dt), None
    (c, _), _ = jax.lax.scan(body, (carry, jnp.asarray(0.0, dtype)), None,
                             length=nsteps)
    return c


# 2. kernel only (frames fixed; carry the output back in as input so the
#    scan cannot be collapsed)
def kernel_only(fr):
    def body(fr, _):
        out = pm._run_kernel(p, cfg, fr, dt, L, False)
        nf = fr.at[:, :, pm.FR:pm.FR + p.S, pm.FR:pm.FR + p.S].set(out)
        return nf, None
    fr, _ = jax.lax.scan(body, fr, None, length=nsteps)
    return fr


# 3. submesh fix step only
def submesh_only(sub):
    def body(s, _):
        return forward_backward_step(p.sub_mesh, cfg, s, 0.0, dt), None
    s, _ = jax.lax.scan(body, sub, None, length=nsteps)
    return s


# 4. refresh only (scatters on the frames)
def refresh_only(fr):
    Kp = fr.shape[-1]
    pc, pe = p.persist["cell"], p.persist["edge"]

    def pad_rows(rows):
        return rows if Kp == K else jnp.pad(rows, ((0, 0), (0, Kp - K)))

    def refresh(flat, m, fix_rows):
        flat = flat.at[m["refill_pos"]].set(flat[m["refill_src"]])
        if m["fix_pos"].size:
            flat = flat.at[m["fix_pos"]].set(pad_rows(fix_rows)[m["fix_row"]])
        if m["zero_pos"].size:
            flat = flat.at[m["zero_pos"]].set(0.0)
        return flat

    def body(fr, _):
        sh1 = fr[0].shape
        nf = fr.at[0].set(refresh(fr[0].reshape(-1, Kp), pc,
                                  fix["h"]).reshape(sh1))
        nf = nf.at[1:4].set(refresh(nf[1:4].reshape(-1, Kp), pe,
                                    fix["u"]).reshape(nf[1:4].shape))
        for l in range(L):
            nf = nf.at[4 + l].set(refresh(nf[4 + l].reshape(-1, Kp), pc,
                                          fix["tr"][l]).reshape(sh1))
        return nf, None
    fr, _ = jax.lax.scan(body, fr, None, length=nsteps)
    return fr


sub0 = MS(h=st.h[p.sub_cells], u=st.u[p.sub_edges],
          tracers=st.tracers[:, p.sub_cells])
print(f"# n={n} tile={p.by} classes={len(p.class_lists)} "
      f"npl={p.npl} sub_cells={p.sub_cells.size}", flush=True)
timed("full-step", full, (frames, fix))
timed("kernel-only", kernel_only, frames)
timed("submesh-only", submesh_only, sub0)
timed("refresh-only", refresh_only, frames)
print("done", flush=True)
