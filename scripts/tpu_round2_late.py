"""Hardware timing queue for the round-2-late fused paths.

Ranked per CLAUDE.md round-3 leads; each result prints (flushed) as it
lands so a tunnel dropout mid-queue still leaves the earlier numbers.

  1. sphere FB patch default (re-baseline) + tile32 + K8 + tile32K8
  2. planar FB mega default vs OMEGA_MEGA_PARITY=1
  3. fused split-explicit (splitpre/subcycle/splitpost) vs composed ref
  4. sphere RK2/RK4 fused stage kernels
  5. planar RK2/RK4 parity A/B

Run: timeout 3000 python scripts/tpu_round2_late.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import (forward_backward_step, rk2_step, rk4_step,
                                run_steps)
from omega_tpu.stepping.split import split_forward_backward_step

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32
NSTEPS = 20
REPS = 4


def time_run(tag, mesh, cfg, st, stepper, dt=30.0, nsteps=NSTEPS, reps=REPS):
    stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, dt, nsteps,
                                        stepper=stepper))
    t0 = time.perf_counter()
    out = jax.block_until_ready(stepn(st))
    comp = time.perf_counter() - t0
    el = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(stepn(st))
        el = min(el, time.perf_counter() - t0)
    ok = bool(jnp.isfinite(out.h).all())
    print(f"[timing] {tag}: {el / nsteps * 1e3:.2f} ms/step "
          f"(compile {comp:.0f}s, finite={ok})", flush=True)
    return out


def planar_init(nx, K, L, seed=0):
    mesh = planar_hex_mesh(nx, nx, dc=5000.0, f0=1e-4,
                           bottom_depth=1000.0).astype(dtype).device_put()
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    rng = np.random.default_rng(seed)
    kx = 2 * np.pi / mesh.x_period
    ky = 2 * np.pi / mesh.y_period
    ssh = np.sin(kx * np.asarray(mesh.x_cell)) * \
        np.sin(ky * np.asarray(mesh.y_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K, dtype) * jnp.ones((1, K),
                                                                   dtype)
    st = ModelState(
        h=h,
        u=jnp.asarray(0.01 * rng.standard_normal((mesh.nedges, K)), dtype),
        tracers=jnp.asarray(10.0 + rng.standard_normal((L, mesh.ncells, K)),
                            dtype))
    return mesh, cfg, st


def sphere_init(n, K, L):
    from omega_tpu.mesh.icos_patches import patch_icos_mesh
    from omega_tpu.mesh.spherical import spherical_icos_mesh
    mesh = patch_icos_mesh(spherical_icos_mesh(n), n).astype(dtype)
    mesh = mesh.device_put()
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    ssh = np.sin(2 * np.asarray(mesh.lat_cell)) * np.cos(
        np.asarray(mesh.lon_cell))
    depth0 = float(np.asarray(mesh.bottom_depth)[0])
    h = jnp.asarray((depth0 + ssh[:, None]) / K, dtype) * jnp.ones((1, K),
                                                                   dtype)
    st = ModelState(
        h=h, u=jnp.zeros((mesh.nedges, K), dtype),
        tracers=10.0 + jnp.zeros((L, mesh.ncells, K), dtype))
    return mesh, cfg, st


# ---- 1. sphere FB: default / tile32 / K8 / tile32+K8 ----
smesh, scfg, sst = sphere_init(48, 100, 2)
for tag, env in (
    # sphere-fb-default measured 19.49 ms/step (2026-08-19 run)
    ("sphere-fb-tile32", {"OMEGA_PATCH_TILE": "32"}),
    ("sphere-fb-tile32-K8", {"OMEGA_PATCH_TILE": "32", "OMEGA_PATCH_K": "8"}),
):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        time_run(tag, smesh, scfg, sst, forward_backward_step)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v

# ---- 2. planar FB mega: default vs parity-split ----
pmesh, pcfg, pst = planar_init(256, 100, 2)
time_run("planar-fb-mega", pmesh, pcfg, pst, forward_backward_step)
os.environ["OMEGA_MEGA_PARITY"] = "1"
time_run("planar-fb-mega-parity", pmesh, pcfg, pst, forward_backward_step)
os.environ["OMEGA_MEGA_PARITY"] = "0"

# ---- 3. fused split-explicit ----
pcfg_split = ModelConfig(nvertlayers=100, ntracers=2,
                         ssh_formulation="column",
                         tendencies=TendencyConfig(visc_del2=1.0e3,
                                                   visc_del4=1.0e9))
time_run("planar-split-fused", pmesh, pcfg_split, pst,
         split_forward_backward_step, dt=120.0)

# ---- 4. sphere RK2/RK4 fused ----
time_run("sphere-rk2-fused", smesh, scfg, sst, rk2_step)
time_run("sphere-rk4-fused", smesh, scfg, sst, rk4_step)

# ---- 5. planar RK2/RK4 parity A/B ----
os.environ["OMEGA_MEGA_PARITY"] = "1"
time_run("planar-rk2-mega-parity", pmesh, pcfg, pst, rk2_step)
time_run("planar-rk4-mega-parity", pmesh, pcfg, pst, rk4_step)
os.environ["OMEGA_MEGA_PARITY"] = "0"

print("queue done", flush=True)
