"""Decompose the flagship FB step cost by component (TPU).

Same measurement protocol as bench.py (the only one the axon tunnel makes
trustworthy): each component is wrapped in a jitted lax.scan of NSTEPS
carry-dependent iterations, timed as min over reps; only relative
comparisons within this one process are meaningful.

Usage: python profile_step.py [components...]   (default: coarse groups)
Env: OMEGA_PALLAS_STENCIL=1 to profile the Pallas stencil path.
"""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from omega_tpu.core import (ModelConfig, ModelState, TendencyConfig,
                                tendencies as tend_mod)
    from omega_tpu.core import aux as auxmod
    from omega_tpu.mesh import planar_hex_mesh
    from omega_tpu.ops import trisk
    from omega_tpu.stepping import forward_backward_step

    dtype = jnp.float32
    nx = int(os.environ.get("OMEGA_BENCH_NX", 256))
    nlayers = int(os.environ.get("OMEGA_BENCH_NLAYERS", 100))
    ntracers = 2
    nsteps = int(os.environ.get("OMEGA_BENCH_NSTEPS", 20))
    reps = int(os.environ.get("OMEGA_BENCH_REPS", 3))

    mesh = planar_hex_mesh(nx, nx, dc=5000.0, f0=1e-4,
                           bottom_depth=1000.0).astype(dtype).device_put()
    cfg = ModelConfig(nvertlayers=nlayers, ntracers=ntracers,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9))
    kx = 2 * np.pi / mesh.x_period
    ky = 2 * np.pi / mesh.y_period
    ssh = np.sin(kx * np.asarray(mesh.x_cell)) * \
        np.sin(ky * np.asarray(mesh.y_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / nlayers,
                    dtype) * jnp.ones((1, nlayers), dtype)
    u0 = 0.01 * jnp.ones((mesh.nedges, nlayers), dtype)
    tr = 10.0 + jnp.zeros((ntracers, mesh.ncells, nlayers), dtype)
    state = ModelState(h=h, u=u0, tracers=tr)
    dt = 30.0
    eps = jnp.asarray(1e-6, dtype)

    def scan_time(name, body, init):
        """body: carry -> carry. Returns per-iteration ms (min over reps)."""
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (body(c), None), c, None,
                                length=nsteps)[0]
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(init))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(init))
            best = min(best, time.perf_counter() - t0)
        ms = best / nsteps * 1e3
        print(f"{name:24s} {ms:9.3f} ms/iter   (compile {compile_s:.1f} s)")
        return ms

    COARSE = {
        "full_fb_step": lambda: scan_time(
            "full_fb_step",
            lambda st: forward_backward_step(mesh, cfg, st, 0.0, dt),
            state),
        "thickness_tend": lambda: scan_time(
            "thickness_tend",
            lambda st: st._replace(h=st.h + eps * tend_mod.
                                   compute_thickness_tendency(
                                       mesh, cfg, st.h, st.u, 0.0)[0]),
            state),
        "velocity_tend": lambda: scan_time(
            "velocity_tend",
            lambda st: st._replace(u=st.u + eps * tend_mod.
                                   compute_velocity_tendency(
                                       mesh, cfg, st.h, st.u, 0.0)[0]),
            state),
        "tracer_tend": lambda: scan_time(
            "tracer_tend",
            lambda st: st._replace(
                tracers=st.tracers + eps * tend_mod.compute_tracer_tendency(
                    mesh, cfg, st.h, st.u, st.tracers,
                    auxmod.thickness_aux_edge(mesh, cfg, st.h,
                                              st.u).mean_h_edge,
                    0.0, h_new=st.h, dt=dt)[0]),
            state),
    }

    E, C = mesh.nedges, mesh.ncells
    ue = 0.01 * jnp.ones((E, nlayers), dtype)
    hc = 10.0 * jnp.ones((C, nlayers), dtype)
    STENCILS = {
        "op_div": lambda: scan_time(
            "op_div", lambda x: x + eps * trisk.grad_edge(
                mesh, trisk.div_cell(mesh, x)), ue),
        "op_tang": lambda: scan_time(
            "op_tang", lambda x: x + eps * trisk.tangential_edge(mesh, x),
            ue),
        "op_curl_kite": lambda: scan_time(
            "op_curl_kite",
            lambda x: x + eps * trisk.grad_edge(mesh, trisk.ke_cell(mesh, x)),
            ue),
        "op_pair": lambda: scan_time(
            "op_pair",
            lambda x: x + eps * sum(trisk.cell_pair_on_edge(
                mesh, trisk.div_cell(mesh, x))), ue),
        "elementwise": lambda: scan_time(
            "elementwise", lambda x: x * (1.0 + eps) + eps, ue),
    }

    names = sys.argv[1:] or list(COARSE)
    all_parts = {**COARSE, **STENCILS}
    if names == ["all"]:
        names = list(all_parts)
    for n in names:
        all_parts[n]()


if __name__ == "__main__":
    main()
