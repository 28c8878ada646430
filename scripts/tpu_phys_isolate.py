"""Isolate which fused-physics feature hangs the Mosaic compile.

Usage: python scripts/tpu_phys_isolate.py <wind|drag|vmix|all|none>

Compiles ONE fb_megastep_stacked launch (the smallest program with the
feature) on a small 64^2 mesh and times compile + one execution.  Run
each variant in its own process under timeout so a hang only loses that
variant.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1]
for kv in sys.argv[2:]:
    k, _, v = kv.partition("=")
    os.environ[k] = v

import numpy as np
import jax
import jax.numpy as jnp

from omega_tpu.core import (ModelConfig, ModelState, TendencyConfig,
                            VertMixConfig)
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.ops import megastep

assert jax.default_backend() == "tpu", jax.devices()
dtype = jnp.float32

mesh = planar_hex_mesh(64, 64, dc=5000.0, f0=1e-4,
                       bottom_depth=1000.0).astype(dtype).device_put()
vm = VertMixConfig(enabled=variant in ("vmix", "all"))
tc = TendencyConfig(visc_del2=1.0e3, visc_del4=1.0e9,
                    wind_forcing=variant in ("wind", "all"),
                    bottom_drag=variant in ("drag", "all"),
                    bottom_drag_coeff=3.0e-3)
cfg = ModelConfig(nvertlayers=100, ntracers=2, vert_mix=vm, tendencies=tc)
assert megastep.supported(mesh, cfg), variant

kx = 2 * np.pi / mesh.x_period
ssh = np.sin(kx * np.asarray(mesh.x_cell))
h = jnp.asarray((1000.0 + ssh[:, None]) / 100, dtype) * jnp.ones((1, 100),
                                                                 dtype)
st = ModelState(h=h, u=jnp.zeros((mesh.nedges, 100), dtype),
                tracers=10.0 + jnp.zeros((2, mesh.ncells, 100), dtype))
stacked = megastep.stack_state(mesh, st)
wind = None
if variant in ("wind", "all"):
    ws = (jnp.asarray(0.1 * np.ones(mesh.ncells), dtype),
          jnp.asarray(0.02 * np.ones(mesh.ncells), dtype))
    wind = megastep.stack_wind(mesh, cfg, ws, dtype)

t0 = time.perf_counter()
out = jax.block_until_ready(megastep.fb_megastep_stacked(
    mesh, cfg, stacked, 30.0, wind=wind))
print(f"[{variant}] compile+run {time.perf_counter() - t0:.1f}s "
      f"finite={bool(jnp.isfinite(out).all())}", flush=True)
t0 = time.perf_counter()
out = jax.block_until_ready(megastep.fb_megastep_stacked(
    mesh, cfg, out, 30.0, wind=wind))
print(f"[{variant}] second run {time.perf_counter() - t0:.3f}s", flush=True)
