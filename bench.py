"""Flagship single-chip benchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's perf spec (doc/design/OmegaV0ShallowWater.md:
681-692): inertia-gravity wave, full nonlinear terms, 100 identical layers,
planar hex mesh, forward-backward stepping. Metric = grid-points * steps / s
on one chip (grid-points = cells * layers). The reference publishes no
absolute numbers (BASELINE.json published: {}), so vs_baseline is measured
against a fixed HBM-bandwidth speed-of-light model for the FB step
(see _roofline_estimate): 1.0 means running at the memory roofline.
"""

import json
import os
import sys
import time

import numpy as np


def _roofline_estimate(ncells, nedges, nvertices, nlayers, ntracers,
                       bytes_per_el=4, hbm_gbps=800.0):
    """Crude speed-of-light step time from unavoidable HBM traffic.

    Counts each (element, layer) field the FB step must read or write at
    least once, with gather amplification ignored (perfect cache of the
    K-contiguous rows). v5e-class HBM ~800 GB/s.

    NOTE (round 4, cross-checked with XLA cost analysis — see
    BENCH_NOTES.md): this denominator models the COMPOSED formulation's
    traffic (~32 logical fields/step, the reference's own memory
    pattern), so vs_baseline = fraction of the reference formulation's
    HBM speed-of-light. The fused mega kernel's own minimal traffic
    (state in + state out once) is ~7x smaller, and the kernel is
    VPU-compute-bound, not bandwidth-bound, at that level; the
    compiler-measured operand bytes are printed on stderr below.
    """
    # fields touched per step (read+write, very rough):
    cell_fields = 6 + 3 * ntracers          # h, ssh, ke, div, del2div, tend...
    edge_fields = 12 + 2 * ntracers         # u, fluxes, aux, tend
    vert_fields = 5
    elems = (cell_fields * ncells + edge_fields * nedges
             + vert_fields * nvertices)
    traffic = elems * nlayers * bytes_per_el * 2.0   # read + write-ish
    return traffic / (hbm_gbps * 1e9)


def main():
    os.environ.setdefault("XLA_FLAGS", "")
    import jax
    import jax.numpy as jnp

    from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
    from omega_tpu.mesh import planar_hex_mesh
    from omega_tpu.stepping import forward_backward_step, run_steps

    dtype = jnp.float32
    nx = int(os.environ.get("OMEGA_BENCH_NX", 256))
    nlayers = int(os.environ.get("OMEGA_BENCH_NLAYERS", 100))
    ntracers = int(os.environ.get("OMEGA_BENCH_NTRACERS", 2))
    nsteps = int(os.environ.get("OMEGA_BENCH_NSTEPS", 20))
    mesh_kind = os.environ.get("OMEGA_BENCH_MESH", "planar")

    if mesh_kind == "qu240":
        # the mesh scale BASELINE actually names (QU240, ~7k cells;
        # doc/design/OmegaV0ShallowWater.md:681-692): icos24 is the
        # in-repo analogue (5,762 cells). Same sphere path below.
        os.environ.setdefault("OMEGA_BENCH_SUBDIV", "24")
        mesh_kind = "sphere"
    if mesh_kind == "icos96":
        # 92k-cell global mesh; needs the weight-plane stack as a
        # runtime operand to stay under the remote-compile body limit
        os.environ.setdefault("OMEGA_BENCH_SUBDIV", "96")
        os.environ.setdefault("OMEGA_PLANES_ARG", "1")
        mesh_kind = "sphere"
    if mesh_kind == "sphere":
        # global icos mesh — the QU240-style configuration. Default:
        # patch-structured layout (streaming per-rhombus stencils,
        # mesh/icos_patches.py); OMEGA_PATCHES=0 falls back to the
        # SFC-renumbered gather path. The flagship bench is inviscid,
        # so build the TIGHT radius-6 validity masks (19.90 vs 22.05 ms
        # with the physics-capable worst-case masks at icos48)
        os.environ.setdefault("OMEGA_PATCH_PHYS_MASKS", "0")
        from omega_tpu.mesh.reorder import reorder_mesh
        from omega_tpu.mesh.spherical import spherical_icos_mesh
        n = int(os.environ.get("OMEGA_BENCH_SUBDIV", 48))
        if os.environ.get("OMEGA_PATCHES", "1") not in ("0", "false", "no"):
            from omega_tpu.mesh.icos_patches import patch_icos_mesh
            mesh = patch_icos_mesh(spherical_icos_mesh(n), n).astype(dtype)
        else:
            mesh = reorder_mesh(spherical_icos_mesh(n)).astype(dtype)
    else:
        mesh = planar_hex_mesh(nx, nx, dc=5000.0, f0=1e-4,
                               bottom_depth=1000.0).astype(dtype)
    mesh = mesh.device_put()
    # hyperviscosity scaled for the 5 km mesh: the reference default
    # ViscDel4=1.2e11 targets QU240-scale cells and is explicitly unstable
    # here (dt*nu4*lambda_max^2 > 2); nu4 ~ dx^3 scaling gives ~1e9
    tflags = {}
    for name in os.environ.get("OMEGA_BENCH_DISABLE", "").split(","):
        if name.strip():
            tflags[name.strip()] = False   # e.g. pv_advection,tracer_horz_adv
    cfg = ModelConfig(nvertlayers=nlayers, ntracers=ntracers,
                      tendencies=TendencyConfig(visc_del2=1.0e3,
                                                visc_del4=1.0e9, **tflags))

    if mesh_kind == "sphere":
        ssh = np.sin(2 * np.asarray(mesh.lat_cell)) * \
            np.cos(np.asarray(mesh.lon_cell))
        depth0 = float(np.asarray(mesh.bottom_depth)[0])
    else:
        kx = 2 * np.pi / mesh.x_period
        ky = 2 * np.pi / mesh.y_period
        ssh = np.sin(kx * np.asarray(mesh.x_cell)) * \
            np.sin(ky * np.asarray(mesh.y_cell))
        depth0 = 1000.0
    h = jnp.asarray((depth0 + ssh[:, None]) / nlayers,
                    dtype) * jnp.ones((1, nlayers), dtype)
    state = ModelState(
        h=h, u=jnp.zeros((mesh.nedges, nlayers), dtype),
        tracers=10.0 + jnp.zeros((ntracers, mesh.ncells, nlayers), dtype))

    dt = 30.0

    if (mesh_kind == "sphere"
            and os.environ.get("OMEGA_PLANES_ARG") == "1"):
        # pass the mesh as a jit ARGUMENT with the kernel weight-plane
        # stack attached as a leaf: keeps the program body small enough
        # for the tunneled remote compile at icos96 (see
        # ops/patch_megastep.attach_planes; bit-exact vs closed-over)
        from omega_tpu.ops import patch_megastep as _pm
        mesh = _pm.attach_planes(mesh, dtype)
        _stepn = jax.jit(lambda s, m: run_steps(m, cfg, s, 0.0, dt,
                                                nsteps,
                                                stepper=forward_backward_step))
        stepn = lambda s: _stepn(s, mesh)  # noqa: E731
    else:
        stepn = jax.jit(lambda s: run_steps(mesh, cfg, s, 0.0, dt, nsteps,
                                            stepper=forward_backward_step))

    # warmup / compile (timed separately, like the reference's first-step
    # timer isolation, ocn/OceanRun.cpp:48-53)
    def fetch(o):
        # scalar device->host fetch: the only sync that has proven
        # reliable through the tunnel (block_until_ready has been seen
        # returning without blocking, and identical (executable, input)
        # calls being short-circuited — round-5 session)
        return float(np.asarray(jax.device_get(o.h[0, 0])))

    t0 = time.perf_counter()
    out = stepn(state)
    fetch(out)
    compile_s = time.perf_counter() - t0

    # min over repetitions: the device is reached through a shared tunnel
    # whose latency/contention varies, and min is the contention-robust
    # statistic for the device-side cost.  Each rep times k=3 vs k=1
    # CHAINED segment calls terminated by a fetch; the difference
    # cancels the constant fetch/dispatch overhead.
    def timed(k, cur):
        t0 = time.perf_counter()
        for _ in range(k):
            cur = stepn(cur)
        fetch(cur)
        return time.perf_counter() - t0, cur

    reps = int(os.environ.get("OMEGA_BENCH_REPS", 5))
    elapsed = float("inf")
    cur = out
    diffs = []
    for _ in range(reps):
        t1, cur = timed(1, cur)
        t3, cur = timed(3, cur)
        diffs.append((t3 - t1) / 2.0)
        if diffs[-1] / nsteps > 0.05e-3:  # ignore impossible readings
            elapsed = min(elapsed, diffs[-1])
    if elapsed == float("inf"):
        # every diff fell under the floor (tiny debug meshes run
        # faster than 50 us/step): min positive diff is the best guess
        pos = [d for d in diffs if d > 0]
        elapsed = min(pos) if pos else float("inf")
    out = cur

    assert bool(jnp.isfinite(out.h).all()), "benchmark produced non-finite h"

    step_time = elapsed / nsteps
    gridpoints = mesh.ncells * nlayers
    value = gridpoints * nsteps / elapsed

    sol = _roofline_estimate(mesh.ncells, mesh.nedges, mesh.nvertices,
                             nlayers, ntracers)
    vs_baseline = sol / step_time   # 1.0 == HBM speed-of-light model

    # compiler-measured operand/result bytes of the scan (the kernel's
    # internal halo-amplified reads are inside the pallas call and not
    # counted; see _roofline_estimate NOTE)
    xla_bytes = None
    try:
        ca = (_stepn.lower(state, mesh) if "_stepn" in dir()
              else stepn.lower(state)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        xla_bytes = float(ca.get("bytes accessed", float("nan"))) / nsteps
    except Exception:
        pass

    print(json.dumps({
        "metric": "gridpoint_steps_per_sec_per_chip",
        "value": value,
        "unit": "cells*layers*steps/s",
        "vs_baseline": vs_baseline,
    }))
    print(f"# ncells={mesh.ncells} nlayers={nlayers} ntracers={ntracers} "
          f"step_time={step_time*1e3:.3f} ms compile={compile_s:.1f} s "
          f"roofline_est={sol*1e3:.3f} ms "
          f"xla_bytes_per_step={xla_bytes} device={jax.devices()[0]}",
          file=sys.stderr)

    # the 1000-step conservation gate at the bench scale
    # (OmegaV0ShallowWater.md:65-67): volume and tracer content to
    # machine precision over a long run
    ngate = int(os.environ.get("OMEGA_BENCH_CONSERVE", "0"))
    if ngate:
        area = jnp.asarray(mesh.area_cell, dtype)[:, None]
        vol0 = float(jnp.sum(area * state.h, dtype=jnp.float64))
        tm0 = float(jnp.sum(area[None] * state.tracers * state.h[None],
                            dtype=jnp.float64))
        st = state
        done = 0
        while done < ngate:
            st = jax.block_until_ready(stepn(st))
            done += nsteps
        vol1 = float(jnp.sum(area * st.h, dtype=jnp.float64))
        tm1 = float(jnp.sum(area[None] * st.tracers * st.h[None],
                            dtype=jnp.float64))
        print(f"# conserve[{done} steps]: vol_drift="
              f"{(vol1 - vol0) / vol0:.3e} tracer_drift="
              f"{(tm1 - tm0) / tm0:.3e} "
              f"finite={bool(jnp.isfinite(st.h).all())}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
