"""Multi-device patch-sphere fast path (parallel/patch_shard.py).

The sharded framed step must reproduce the single-device framed step to
roundoff: the kernel output and the refresh copies are bit-identical
(verified while developing), and the replicated pole-fix substep — the
same tiny composed step, recompiled inside the shard_map context — may
differ by 1-2 ulp where XLA fuses differently, so the whole-state check
allows 1e-13.
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces CPU backend, 8 virtual devices)

import jax
import jax.numpy as jnp

from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
from omega_tpu.mesh.icos_patches import patch_icos_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.ops import patch_megastep as pm
from omega_tpu.parallel.patch_shard import make_patch_sharded_run

N_SUB, K, L = 8, 3, 2


@pytest.fixture(scope="module")
def setup():
    mesh = patch_icos_mesh(spherical_icos_mesh(N_SUB, bottom_depth=1000.0),
                           N_SUB)
    cfg = ModelConfig(nvertlayers=K, ntracers=L,
                      tendencies=TendencyConfig(visc_del2=1e3,
                                                visc_del4=1e7))
    ssh = 2.0 * np.sin(2 * np.asarray(mesh.lat_cell)) * \
        np.cos(np.asarray(mesh.lon_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K) * jnp.ones((1, K))
    st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K)),
                    tracers=10.0 + jnp.asarray(
                        np.cos(np.asarray(mesh.lat_cell))[None, :, None]
                        * np.ones((L, 1, K))))
    # single-device framed reference (same kernel + refresh machinery)
    carry = pm.stack_frames(mesh, cfg, st)
    t, dt, nsteps = 0.0, 300.0, 3
    for i in range(nsteps):
        carry = pm.fb_patch_megastep_framed(
            mesh, cfg, carry, t + i * dt, dt, K=K, L=L, interpret=True)
    ref = pm.unstack_frames(mesh, carry, K, L, ModelState)
    return mesh, cfg, st, ref, dt, nsteps


@pytest.mark.parametrize("nshards", [2, 5])
def test_patch_sharded_matches_single(setup, nshards):
    mesh, cfg, st, ref, dt, nsteps = setup
    run = make_patch_sharded_run(mesh, cfg, nshards, interpret=True)
    out = run(st, 0.0, dt, nsteps)
    for nm in ("h", "u", "tracers"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, nm)), np.asarray(getattr(ref, nm)),
            rtol=0, atol=1e-13, err_msg=f"{nm} @ {nshards} shards")


def test_patch_sharded_land_masked():
    """Sharding composes with land masking: the masked mesh's chain
    (mask gates + per-position edge_mask plane) runs under 2 shards and
    matches the single-device framed step; land edges stay at rest."""
    from omega_tpu.mesh.icos_patches import apply_land_mask

    base = patch_icos_mesh(spherical_icos_mesh(N_SUB, bottom_depth=1000.0),
                           N_SUB)
    land = np.asarray(base.lat_cell) > np.deg2rad(55.0)
    mesh = apply_land_mask(base, land)
    cfg = ModelConfig(nvertlayers=K, ntracers=1,
                      tendencies=TendencyConfig(visc_del2=1e3,
                                                visc_del4=1e7))
    ssh = 2.0 * np.sin(2 * np.asarray(mesh.lat_cell)) * \
        np.cos(np.asarray(mesh.lon_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K) * jnp.ones((1, K))
    st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K)),
                    tracers=10.0 + jnp.zeros((1, mesh.ncells, K)))
    dt, nsteps = 300.0, 3

    carry = pm.stack_frames(mesh, cfg, st)
    for i in range(nsteps):
        carry = pm.fb_patch_megastep_framed(
            mesh, cfg, carry, i * dt, dt, K=K, L=1, interpret=True)
    ref = pm.unstack_frames(mesh, carry, K, 1, ModelState)

    run = make_patch_sharded_run(mesh, cfg, 2, interpret=True)
    out = run(st, 0.0, dt, nsteps)
    for nm in ("h", "u", "tracers"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, nm)), np.asarray(getattr(ref, nm)),
            rtol=0, atol=1e-13, err_msg=nm)
    em = np.asarray(mesh.edge_mask)
    np.testing.assert_array_equal(np.asarray(out.u)[em == 0], 0.0)


def test_patch_sharded_rejects_bad_counts(setup):
    mesh, cfg, *_ = setup
    from omega_tpu.parallel.patch_shard import build_patch_shard
    with pytest.raises(ValueError):
        build_patch_shard(mesh, 4, np.float64)


def test_patch_sharded_physics_wind_drag_vmix():
    """Multi-chip patch sharding composes with the round-4 fused
    physics: wind planes split per device, drag/vmix in-kernel, the
    replicated pole-fix substep fed the submesh wind slice — matches
    the single-device framed step exactly."""
    from omega_tpu.core import VertMixConfig

    mesh = patch_icos_mesh(spherical_icos_mesh(N_SUB, bottom_depth=1000.0),
                           N_SUB)
    cfg = ModelConfig(
        nvertlayers=K, ntracers=1,
        vert_mix=VertMixConfig(enabled=True, kappa_tracer=1e-3,
                               kappa_momentum=1e-2),
        tendencies=TendencyConfig(visc_del2=1e3, visc_del4=1e7,
                                  wind_forcing=True, bottom_drag=True,
                                  bottom_drag_coeff=3.0e-3))
    ssh = 2.0 * np.sin(2 * np.asarray(mesh.lat_cell)) * \
        np.cos(np.asarray(mesh.lon_cell))
    h = jnp.asarray((1000.0 + ssh[:, None]) / K) * jnp.ones((1, K))
    st = ModelState(h=h, u=jnp.zeros((mesh.nedges, K)),
                    tracers=10.0 + jnp.zeros((1, mesh.ncells, K)))
    wind = (jnp.asarray(0.1 * np.cos(np.asarray(mesh.lat_cell))),
            jnp.asarray(0.05 * np.ones(mesh.ncells)))
    dt, nsteps = 300.0, 2

    wb = pm.make_wind(mesh, cfg, wind, st.h.dtype)
    carry = pm.stack_frames(mesh, cfg, st)
    for i in range(nsteps):
        carry = pm.fb_patch_megastep_framed(
            mesh, cfg, carry, i * dt, dt, K=K, L=1, interpret=True,
            wind=wb)
    ref = pm.unstack_frames(mesh, carry, K, 1, ModelState)

    run = make_patch_sharded_run(mesh, cfg, 2, interpret=True)
    out = run(st, 0.0, dt, nsteps, wind_stress=wind)
    for nm in ("h", "u", "tracers"):
        np.testing.assert_allclose(
            np.asarray(getattr(out, nm)), np.asarray(getattr(ref, nm)),
            rtol=0, atol=1e-12, err_msg=nm)
    assert float(jnp.abs(out.u[:, 0]).max()) > 0
