"""Roofline denominator from the compiler, not the hand count.

bench.py's vs_baseline divides a hand-counted traffic model by the
measured step time (VERDICT r3 weak-point 8).  This script asks XLA for
the compiled executable's own cost analysis (bytes accessed / flops) of
the 20-step scan on both flagship meshes, times the scan, and prints
bytes-per-step, achieved HBM bandwidth, and the bandwidth fraction
against the v5e ~819 GB/s spec — a measured-artifact replacement for
the model denominator (the numbers land in BENCH_NOTES.md).

Note cost_analysis() "bytes accessed" counts each HLO's operand+result
bytes, so values that stay resident in VMEM across a fusion are not
charged: for a Pallas-kernel step it is effectively the HBM traffic of
the kernel's in/out arrays, which is exactly the roofline denominator.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.stepping import forward_backward_step, run_steps

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32
K, L, NSTEPS = 100, 2, 20
HBM_GBPS = 819.0   # v5e spec


def report(tag, mesh, cfg, st):
    stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, 30.0, NSTEPS,
                                        stepper=forward_backward_step))
    lowered = stepn.lower(st)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    bytes_total = float(ca.get("bytes accessed", float("nan")))
    flops = float(ca.get("flops", float("nan")))
    t0 = time.perf_counter()
    out = jax.block_until_ready(compiled(st))
    el = float("inf")
    cur = out
    for _ in range(4):
        t0 = time.perf_counter()
        cur = jax.block_until_ready(compiled(cur))
        rep = time.perf_counter() - t0
        if rep * 1e3 / NSTEPS > 0.05:
            el = min(el, rep)
    step_ms = el / NSTEPS * 1e3
    bps = bytes_total / NSTEPS
    bw = bps / (el / NSTEPS) / 1e9
    print(json.dumps({
        "tag": tag, "step_ms": round(step_ms, 3),
        "bytes_per_step": bps, "flops_per_step": flops / NSTEPS,
        "achieved_GBps": round(bw, 1),
        "bw_fraction": round(bw / HBM_GBPS, 3)}), flush=True)


# ---- planar flagship ----
mesh = planar_hex_mesh(256, 256, dc=5000.0, f0=1e-4,
                       bottom_depth=1000.0).astype(dtype).device_put()
cfg = ModelConfig(nvertlayers=K, ntracers=L,
                  tendencies=TendencyConfig(visc_del2=1.0e3,
                                            visc_del4=1.0e9))
kx = 2 * np.pi / mesh.x_period
ky = 2 * np.pi / mesh.y_period
ssh = np.sin(kx * np.asarray(mesh.x_cell)) * \
    np.sin(ky * np.asarray(mesh.y_cell))
h = jnp.asarray((1000.0 + ssh[:, None]) / K, dtype) * jnp.ones((1, K), dtype)
st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K), dtype),
                tracers=10.0 + jnp.zeros((L, mesh.ncells, K), dtype))
report("planar-fb-256", mesh, cfg, st)

# ---- sphere flagship ----
from omega_tpu.mesh.icos_patches import patch_icos_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
n = int(os.environ.get("OMEGA_BENCH_SUBDIV", 48))
smesh = patch_icos_mesh(spherical_icos_mesh(n), n).astype(dtype).device_put()
sshs = np.sin(2 * np.asarray(smesh.lat_cell)) * \
    np.cos(np.asarray(smesh.lon_cell))
d0 = float(np.asarray(smesh.bottom_depth)[0])
hs = jnp.asarray((d0 + sshs[:, None]) / K, dtype) * jnp.ones((1, K), dtype)
sts = ModelState(h=hs, u=jnp.zeros((smesh.nedges, K), dtype),
                 tracers=10.0 + jnp.zeros((L, smesh.ncells, K), dtype))
report(f"sphere-fb-icos{n}", smesh, cfg, sts)
print("done", flush=True)
