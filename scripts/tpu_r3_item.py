"""One hardware timing item per process (round 3).

Usage: python scripts/tpu_r3_item.py <item> [env KEY=VAL ...]

Each item runs in its own process so a wedged tunnel connection only
loses that item (the round-2 monolithic queue stalled >25 min on one
dead TCP read).  Items print one line each; the driver shell loops with
per-item timeouts.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

item = sys.argv[1]
for kv in sys.argv[2:]:
    k, _, v = kv.partition("=")
    os.environ[k] = v

import time  # noqa: E402

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig  # noqa: E402
from omega_tpu.mesh import planar_hex_mesh  # noqa: E402
from omega_tpu.stepping import (forward_backward_step, rk2_step,  # noqa: E402
                                rk4_step, run_steps)
from omega_tpu.stepping.split import split_forward_backward_step  # noqa: E402

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32
NSTEPS = int(os.environ.get("OMEGA_TIME_NSTEPS", 20))
REPS = int(os.environ.get("OMEGA_TIME_REPS", 4))


def measure(tag, stepn, st, fetch):
    """Fetch-terminated differenced timing.

    Round 5: the tunneled runtime has been seen returning from
    block_until_ready WITHOUT blocking (whole reps "complete" in 20 us),
    on top of the earlier short-circuiting of identical calls.  Chained
    calls terminated by a scalar device->host FETCH are the only sync
    that has proven reliable; timing k=3 vs k=1 chained segments and
    differencing cancels the constant fetch/dispatch overhead."""
    t0 = time.perf_counter()
    out = stepn(st)
    fetch(out)
    comp = time.perf_counter() - t0

    def timed(k, cur):
        t0 = time.perf_counter()
        for _ in range(k):
            cur = stepn(cur)
        fetch(cur)
        return time.perf_counter() - t0, cur

    el = float("inf")
    cur = out
    pairs = []
    for _ in range(REPS):
        t1, cur = timed(1, cur)
        t3, cur = timed(3, cur)
        pairs.append((round(t1, 4), round(t3, 4)))
        d = (t3 - t1) / 2.0
        if d * 1e3 / NSTEPS > 0.05:       # ignore impossible readings
            el = min(el, d)
    env = {k: os.environ[k] for k in
           ("OMEGA_PATCH_TILE", "OMEGA_PATCH_K", "OMEGA_PATCH_FB2",
            "OMEGA_PATCH_XROLL", "OMEGA_PATCH_POOL", "OMEGA_PATCH_PP81",
            "OMEGA_MEGA_PARITY", "OMEGA_PLANES_ARG") if k in os.environ}
    print(f"[timing] {tag}: {el / NSTEPS * 1e3:.2f} ms/step "
          f"(compile {comp:.0f}s, env={env}, "
          f"pairs_s={pairs})", flush=True)
    return cur


def time_run(tag, mesh, cfg, st, stepper, dt=30.0):
    if os.environ.get("OMEGA_PLANES_ARG") == "1":
        # weight-plane stack as a runtime operand (mesh passed as a jit
        # ARG): keeps the program body under the axon remote-compile
        # size limit at icos96 (round-4 HTTP 413)
        from omega_tpu.ops import patch_megastep as _pm
        mesh = _pm.attach_planes(mesh, dtype,
                                 fct=cfg.flux_tracer_type == "fct")
        stepn_ = jax.jit(lambda s, m: run_steps(m, cfg, s, 0.0, dt,
                                                NSTEPS, stepper=stepper))
        stepn = lambda s: stepn_(s, mesh)  # noqa: E731
    else:
        stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, dt,
                                            NSTEPS, stepper=stepper))
    out = measure(tag, stepn, st,
                  lambda o: float(np.asarray(jax.device_get(o.h[0, 0]))))
    print(f"[check] {tag}: finite={bool(jnp.isfinite(out.h).all())}",
          flush=True)


def planar_init(nx=256, K=100, L=2, seed=0):
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


def sphere_init(n=None, K=100, L=2):
    n = n or int(os.environ.get("OMEGA_BENCH_SUBDIV", 48))
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


if item.startswith("planar-fb"):
    mesh, cfg, st = planar_init()
    time_run(item, mesh, cfg, st, forward_backward_step)
elif item.startswith("planar-rk2"):
    mesh, cfg, st = planar_init()
    time_run(item, mesh, cfg, st, rk2_step)
elif item.startswith("planar-rk4"):
    mesh, cfg, st = planar_init()
    time_run(item, mesh, cfg, st, rk4_step)
elif item.startswith("planar-split"):
    mesh, _, st = planar_init()
    cfg = ModelConfig(nvertlayers=100, ntracers=2,
                      ssh_formulation="column",
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    time_run(item, mesh, cfg, st, split_forward_backward_step, dt=120.0)
elif item.startswith("sphere-fb"):
    mesh, cfg, st = sphere_init()
    time_run(item, mesh, cfg, st, forward_backward_step)
elif item.startswith("sphere-fct"):
    # two-stage fused Zalesak FCT (fct_patch_megastep_framed via
    # run_steps routing); timing comparable to sphere-fb
    mesh, cfg, st = sphere_init()
    import dataclasses
    cfg = dataclasses.replace(cfg, flux_tracer_type="fct")
    time_run(item, mesh, cfg, st, forward_backward_step)
elif item.startswith("sphere-rk2"):
    mesh, cfg, st = sphere_init()
    time_run(item, mesh, cfg, st, rk2_step)
elif item.startswith("sphere-rk4"):
    mesh, cfg, st = sphere_init()
    time_run(item, mesh, cfg, st, rk4_step)
elif item.startswith("sphere-split"):
    mesh, _, st = sphere_init()
    cfg = ModelConfig(nvertlayers=100, ntracers=2,
                      ssh_formulation="column",
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    time_run(item, mesh, cfg, st, split_forward_backward_step, dt=120.0)
elif item.startswith("planar-phys"):
    # science config: wind + drag + vmix INSIDE the fused kernel
    from omega_tpu.core import VertMixConfig
    mesh, _, st = planar_init()
    cfg = ModelConfig(
        nvertlayers=100, ntracers=2,
        vert_mix=VertMixConfig(enabled=True),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    wind = (jnp.asarray(0.1 * np.ones(mesh.ncells), dtype),
            jnp.asarray(0.02 * np.ones(mesh.ncells), dtype))
    stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, NSTEPS,
                                        stepper=forward_backward_step,
                                        wind_stress=wind))
    cur = measure(item, stepn, st,
                  lambda o: float(np.asarray(jax.device_get(o.h[0, 0]))))
    print(f"[check] {item}: finite={bool(jnp.isfinite(cur.h).all())}",
          flush=True)
elif item.startswith("sphere-phys"):
    from omega_tpu.core import VertMixConfig
    mesh, _, st = sphere_init()
    cfg = ModelConfig(
        nvertlayers=100, ntracers=2,
        vert_mix=VertMixConfig(enabled=True),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    wind = (jnp.asarray(0.1 * np.cos(np.asarray(mesh.lat_cell)), dtype),
            jnp.asarray(0.02 * np.ones(mesh.ncells), dtype))
    stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, NSTEPS,
                                        stepper=forward_backward_step,
                                        wind_stress=wind))
    cur = measure(item, stepn, st,
                  lambda o: float(np.asarray(jax.device_get(o.h[0, 0]))))
    print(f"[check] {item}: finite={bool(jnp.isfinite(cur.h).all())}",
          flush=True)
elif item.startswith("sphere-pp81"):
    # Richardson-number vmix (PP81) — fused when OMEGA_PATCH_PP81=1
    from omega_tpu.core import VertMixConfig
    mesh, _, st = sphere_init()
    cfg = ModelConfig(
        nvertlayers=100, ntracers=2,
        vert_mix=VertMixConfig(enabled=True, scheme="pp81",
                               temp_index=0, salt_index=1),
        tendencies=TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    from omega_tpu.ops import patch_megastep as _pm
    print(f"[info] {item}: fused={_pm.supported(mesh, cfg)}", flush=True)
    wind = (jnp.asarray(0.1 * np.cos(np.asarray(mesh.lat_cell)), dtype),
            jnp.asarray(0.02 * np.ones(mesh.ncells), dtype))
    stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, NSTEPS,
                                        stepper=forward_backward_step,
                                        wind_stress=wind))
    cur = measure(item, stepn, st,
                  lambda o: float(np.asarray(jax.device_get(o.h[0, 0]))))
    print(f"[check] {item}: finite={bool(jnp.isfinite(cur.h).all())}",
          flush=True)
elif item.startswith("sphere-upwind"):
    mesh, _, st = sphere_init()
    cfg = ModelConfig(nvertlayers=100, ntracers=2,
                      flux_thickness_type="upwind",
                      flux_tracer_type="upwind",
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    time_run(item, mesh, cfg, st, forward_backward_step)
else:
    raise SystemExit(f"unknown item {item}")
