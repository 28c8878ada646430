"""Vertical-extension tests: VertCoord scans, EOS, tridiagonal solvers,
implicit vertical mixing — mirroring the reference's VertCoordTest (608
LoC), EosTest (vs GSW oracle values), and TriDiagSolversTest (622 LoC vs
reference solutions)."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from omega_tpu.core import eos, vert_coord, vmix
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.ops import tridiag


# ---------------- EOS ----------------

def test_teos10_published_check_value():
    """Roquet et al. (2015) polyTEOS10-75t check value:
    specvol(SA=30 g/kg, CT=10 C, p=1000 dbar) = 9.732819628e-04 m3/kg."""
    v = float(eos.teos10_specvol(jnp.array(10.0), jnp.array(30.0),
                                 jnp.array(1000.0e4)))
    assert abs(v - 9.732819628e-04) < 1e-12


def test_teos10_standard_ocean_density():
    """TEOS-10 rho(SSO, 0C, 0) = 1028.10720 kg/m3 (documented value)."""
    v = float(eos.teos10_specvol(jnp.array(0.0), jnp.array(35.16504),
                                 jnp.array(0.0)))
    assert abs(1.0 / v - 1028.10720) < 1e-3


def test_teos10_physical_derivatives():
    """Thermal expansion and haline contraction have the right signs and
    magnitudes in ocean conditions; compressibility positive."""
    ct, sa, p = jnp.array(10.0), jnp.array(35.0), jnp.array(1000.0e4)
    eps = 1e-4
    dv_dt = (eos.teos10_specvol(ct + eps, sa, p)
             - eos.teos10_specvol(ct - eps, sa, p)) / (2 * eps)
    dv_ds = (eos.teos10_specvol(ct, sa + eps, p)
             - eos.teos10_specvol(ct, sa - eps, p)) / (2 * eps)
    dv_dp = (eos.teos10_specvol(ct, sa, p + 1e3)
             - eos.teos10_specvol(ct, sa, p - 1e3)) / 2e3
    assert float(dv_dt) > 0          # warmer -> less dense
    assert float(dv_ds) < 0          # saltier -> denser
    assert float(dv_dp) < 0          # compressible
    # alpha = rho * dv/dT ~ 1.7e-4 /K at these conditions
    rho = 1.0 / float(eos.teos10_specvol(ct, sa, p))
    assert 1.0e-4 < rho * float(dv_dt) < 3.0e-4


def test_linear_eos_and_config():
    c = eos.EosConfig(eos_type="linear", drho_dt=-0.2, drho_ds=0.8,
                      rho_t0_s0=1000.0)
    v = eos.compute_spec_vol(c, jnp.array(10.0), jnp.array(35.0), 0.0)
    assert abs(1.0 / float(v) - (1000.0 - 2.0 + 28.0)) < 1e-12

    from omega_tpu.infra.config import default_config
    ec = eos.EosConfig.from_yaml(default_config())
    assert ec.eos_type == "linear" and ec.drho_ds == 0.8


def test_displaced_specvol():
    """Displaced evaluation uses the pressure of layer k+disp, clamped —
    the stratification diagnostic (Eos.h:60-76)."""
    C, K = 4, 6
    rng = np.random.default_rng(0)
    ct = jnp.asarray(10 + rng.standard_normal((C, K)))
    sa = jnp.asarray(35 + 0.1 * rng.standard_normal((C, K)))
    p = jnp.asarray(np.cumsum(np.full((C, K), 1e5), axis=1))
    c = eos.EosConfig(eos_type="teos10")
    disp = eos.compute_spec_vol_displaced(c, ct, sa, p, 1)
    ref = eos.teos10_specvol(ct[:, :-1], sa[:, :-1], p[:, 1:])
    np.testing.assert_allclose(np.asarray(disp[:, :-1]), np.asarray(ref),
                               rtol=1e-14)
    # clamped last layer: displaced == undisplaced at K-1
    ref_last = eos.teos10_specvol(ct[:, -1], sa[:, -1], p[:, -1])
    np.testing.assert_allclose(np.asarray(disp[:, -1]), np.asarray(ref_last),
                               rtol=1e-14)


# ---------------- VertCoord ----------------

def test_pressure_zheight_scans():
    """Pressure (top-down) and z (bottom-up) scans against a direct
    per-column python reference (VertCoord.cpp:654-735)."""
    C, K = 5, 8
    rng = np.random.default_rng(1)
    h = 50.0 + 10.0 * rng.random((C, K))
    psfc = 1e4 * rng.random(C)
    rho0 = 1026.0
    sv = (1.0 / rho0) * (1 + 0.01 * rng.standard_normal((C, K)))
    bot = 400.0 + 100.0 * rng.random(C)

    p_int, p_mid = vert_coord.compute_pressure(jnp.asarray(h),
                                               jnp.asarray(psfc), rho0)
    z_int, z_mid = vert_coord.compute_z_height(jnp.asarray(h),
                                               jnp.asarray(sv),
                                               jnp.asarray(bot), rho0)
    g = vert_coord.GRAVITY
    for c in range(C):
        acc = psfc[c]
        for k in range(K):
            inc = g * rho0 * h[c, k]
            assert abs(p_mid[c, k] - (acc + 0.5 * inc)) < 1e-6
            acc += inc
            assert abs(p_int[c, k + 1] - acc) < 1e-6
        # z: bottom up
        zacc = -bot[c]
        for k in range(K - 1, -1, -1):
            dz = rho0 * sv[c, k] * h[c, k]
            assert abs(z_mid[c, k] - (zacc + 0.5 * dz)) < 1e-9
            zacc += dz
            assert abs(z_int[c, k] - zacc) < 1e-9

    phi = vert_coord.compute_geopotential(z_mid,
                                          tidal_potential=jnp.ones(C))
    np.testing.assert_allclose(np.asarray(phi),
                               g * np.asarray(z_mid) + 1.0, rtol=1e-12)


def test_layer_bounds_and_masking():
    mesh = planar_hex_mesh(8, 8, dc=1000.0)
    K = 5
    rng = np.random.default_rng(2)
    min_c = jnp.zeros(mesh.ncells, jnp.int32)
    max_c = jnp.asarray(rng.integers(1, K, mesh.ncells), jnp.int32)
    b = vert_coord.layer_bounds(mesh, min_c, max_c, K)
    coe = np.asarray(mesh.cells_on_edge)
    np.testing.assert_array_equal(np.asarray(b.max_edge_top),
                                  np.minimum(np.asarray(max_c)[coe[:, 0]],
                                             np.asarray(max_c)[coe[:, 1]]))
    np.testing.assert_array_equal(np.asarray(b.max_edge_bot),
                                  np.maximum(np.asarray(max_c)[coe[:, 0]],
                                             np.asarray(max_c)[coe[:, 1]]))
    mask = np.asarray(b.cell_mask(K))
    assert mask.shape == (mesh.ncells, K)
    for c in [0, 5, 17]:
        assert mask[c].sum() == int(max_c[c]) + 1


def test_target_thickness_uniform():
    """p-star target redistribution: with uniform weights, total column
    mass is preserved and layers share the deviation equally."""
    C, K = 4, 6
    rng = np.random.default_rng(3)
    ref = 100.0 * np.ones((C, K))
    h = ref * (1 + 0.05 * rng.standard_normal((C, K)))
    rho0 = 1026.0
    p_int, _ = vert_coord.compute_pressure(jnp.asarray(h), jnp.zeros(C),
                                           rho0)
    w = jnp.ones(K)
    mask = jnp.ones((C, K))
    tgt = np.asarray(vert_coord.compute_target_thickness(
        p_int, jnp.asarray(ref), w, mask, rho0))
    # column sums of target == column sums of h (mass conservation)
    np.testing.assert_allclose(tgt.sum(1), h.sum(1), rtol=1e-12)
    # uniform weights + uniform ref -> equal layers
    np.testing.assert_allclose(tgt, np.repeat(h.sum(1)[:, None] / K, K, 1),
                               rtol=1e-12)


# ---------------- TriDiag solvers ----------------

def _random_dd_system(shape, K, seed):
    """Diagonally dominant random system."""
    rng = np.random.default_rng(seed)
    dl = rng.random(shape + (K,))
    du = rng.random(shape + (K,))
    d = 2.0 + dl + du + rng.random(shape + (K,))
    b = rng.standard_normal(shape + (K,))
    return dl, d, du, b


def _dense_solve(dl, d, du, b):
    K = d.shape[-1]
    out = np.empty_like(b)
    flat = b.reshape(-1, K)
    dlf, df, duf = (a.reshape(-1, K) for a in (dl, d, du))
    for i in range(flat.shape[0]):
        A = np.diag(df[i]) + np.diag(dlf[i][1:], -1) + np.diag(duf[i][:-1], 1)
        out.reshape(-1, K)[i] = np.linalg.solve(A, flat[i])
    return out


@pytest.mark.parametrize("K", [1, 2, 5, 8, 100])
def test_thomas_vs_dense(K):
    dl, d, du, b = _random_dd_system((3, 4), K, seed=K)
    x = np.asarray(tridiag.thomas(*map(jnp.asarray, (dl, d, du, b))))
    np.testing.assert_allclose(x, _dense_solve(dl, d, du, b), rtol=1e-10)


@pytest.mark.parametrize("K", [1, 2, 5, 8, 64, 100])
def test_pcr_vs_dense(K):
    dl, d, du, b = _random_dd_system((6,), K, seed=100 + K)
    x = np.asarray(tridiag.pcr(*map(jnp.asarray, (dl, d, du, b))))
    np.testing.assert_allclose(x, _dense_solve(dl, d, du, b), rtol=1e-9)


def test_pcr_matches_thomas():
    dl, d, du, b = _random_dd_system((2, 7), 33, seed=9)
    xt = np.asarray(tridiag.thomas(*map(jnp.asarray, (dl, d, du, b))))
    xp = np.asarray(tridiag.pcr(*map(jnp.asarray, (dl, d, du, b))))
    np.testing.assert_allclose(xp, xt, rtol=1e-9)


def test_diffusion_solver_conserves():
    """Implicit vertical mixing conserves sum(h * phi) per column exactly
    and relaxes toward the column mean for large dt*kappa."""
    C, K = 10, 16
    rng = np.random.default_rng(4)
    h = jnp.asarray(20.0 + 5.0 * rng.random((C, K)))
    phi = jnp.asarray(10.0 + rng.standard_normal((C, K)))
    kappa = jnp.asarray(1e-3 * np.ones((C, K - 1)))
    for method in ("thomas", "pcr"):
        out = vmix.implicit_vmix(h, kappa, 3600.0, phi, method=method)
        np.testing.assert_allclose(np.asarray((h * out).sum(1)),
                                   np.asarray((h * phi).sum(1)), rtol=1e-12)
    # huge diffusivity -> well mixed
    out = vmix.implicit_vmix(h, 1e6 * kappa, 3600.0, phi)
    col_mean = (h * phi).sum(1) / h.sum(1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(col_mean)[:, None] *
                               np.ones((1, K)), rtol=1e-3)
