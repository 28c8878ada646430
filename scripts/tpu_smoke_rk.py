"""Hardware smoke + timing for the RK2/RK4 mega-steps and the
barotropic-subcycle kernel (committed interpret-validated; this script
is the real-TPU check).

Phase 1 (correctness, 64x64 x 8 x 2, f32): mega vs composed for RK2 and
RK4, and OMEGA_BT_KERNEL on/off for the split-explicit step.
Phase 2 (timing, 256^2 x 100 x 2, f32): min-over-reps 20-step scans.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import run_steps, rk2_step, rk4_step
from omega_tpu.stepping.split import split_forward_backward_step

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32


def init(nx, ny, K, L, seed=0):
    mesh = planar_hex_mesh(nx, ny, dc=5000.0, f0=1e-4,
                           bottom_depth=1000.0).astype(dtype).device_put()
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    rng = np.random.default_rng(seed)
    kx = 2 * np.pi / mesh.x_period
    ky = 2 * np.pi / mesh.y_period
    ssh = np.sin(kx * np.asarray(mesh.x_cell)) * \
        np.sin(ky * np.asarray(mesh.y_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K, dtype) * jnp.ones((1, K), dtype)
    st = ModelState(
        h=h,
        u=jnp.asarray(0.01 * rng.standard_normal((mesh.nedges, K)), dtype),
        tracers=jnp.asarray(10.0 + rng.standard_normal((L, mesh.ncells, K)),
                            dtype))
    return mesh, cfg, st


def maxrel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-12)))


# ---- phase 1: correctness ----
mesh, cfg, st = init(64, 64, 8, 2)
for name, stepper in (("rk2", rk2_step), ("rk4", rk4_step)):
    os.environ["OMEGA_MEGA_STEP"] = "1"
    out = jax.block_until_ready(run_steps(mesh, cfg, st, 0.0, 30.0, 4,
                                          stepper=stepper))
    os.environ["OMEGA_MEGA_STEP"] = "0"
    ref = jax.block_until_ready(run_steps(mesh, cfg, st, 0.0, 30.0, 4,
                                          stepper=stepper))
    errs = {n: maxrel(getattr(out, n), getattr(ref, n))
            for n in ("h", "u", "tracers")}
    print(f"[correctness] {name} mega vs composed (4 steps, f32):", errs,
          flush=True)

cfg_split = ModelConfig(nvertlayers=8, ntracers=2,
                        ssh_formulation="column",
                        tendencies=TendencyConfig(visc_del2=1.0e3,
                                                  visc_del4=1.0e9))
s = st
os.environ["OMEGA_BT_KERNEL"] = "1"
out = s
for _ in range(4):
    out = split_forward_backward_step(mesh, cfg_split, out, 0.0, 60.0)
out = jax.block_until_ready(out)
os.environ["OMEGA_BT_KERNEL"] = "0"
ref = s
for _ in range(4):
    ref = split_forward_backward_step(mesh, cfg_split, ref, 0.0, 60.0)
ref = jax.block_until_ready(ref)
errs = {n: maxrel(getattr(out, n), getattr(ref, n))
        for n in ("h", "u", "tracers")}
print("[correctness] split-explicit btk on vs off (4 steps, f32):", errs,
      flush=True)

# ---- phase 2: timing at the flagship size ----
os.environ["OMEGA_MEGA_STEP"] = "1"
os.environ["OMEGA_BT_KERNEL"] = "1"
mesh, cfg, st = init(256, 256, 100, 2)
cfg_split = ModelConfig(nvertlayers=100, ntracers=2,
                        ssh_formulation="column",
                        tendencies=TendencyConfig(visc_del2=1.0e3,
                                                  visc_del4=1.0e9))
nsteps = 20

for name, fn in (
    ("rk2-mega", lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, nsteps,
                                     stepper=rk2_step)),
    ("rk4-mega", lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, nsteps,
                                     stepper=rk4_step)),
    ("split-btk", lambda s: run_steps(mesh, cfg_split, s, 0.0, 120.0, nsteps,
                                      stepper=split_forward_backward_step)),
):
    stepn = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(stepn(st))
    comp = time.perf_counter() - t0
    el = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(stepn(st))
        el = min(el, time.perf_counter() - t0)
    ok = bool(jnp.isfinite(out.h).all())
    print(f"[timing] {name}: {el / nsteps * 1e3:.2f} ms/step "
          f"(compile {comp:.0f}s, finite={ok})", flush=True)
print("done", flush=True)
