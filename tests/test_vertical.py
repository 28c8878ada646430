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


# Recorded 75-term-polynomial sweep over the oceanographic domain
# SA in [0, 42] g/kg x CT in [-2, 40] C x p in [0, 1e8] Pa (0-10,000 dbar).
# Values recorded from this implementation in float64 (round 4) after
# anchoring it at the published Roquet et al. (2015) check value (above,
# matched to 3e-14) -- the sweep pins the full polynomial (all 75 vijk
# terms exercise at these points) against any future coefficient or
# Horner-evaluation regression, standing in for the reference's GSW-C
# battery (test/CMakeLists.txt:440-449; the vendored GSW-C submodule is
# empty, so the library itself cannot run here).
_TEOS10_SWEEP = [
    (0.0, -2.0, 0.0, 0.00100031851865069),
    (0.0, -2.0, 10000000.0, 0.0009952428829289259),
    (0.0, -2.0, 50000000.0, 0.0009765319540446061),
    (0.0, -2.0, 100000000.0, 0.0009563529908688161),
    (0.0, 0.0, 0.0, 0.0010001565419031),
    (0.0, 0.0, 10000000.0, 0.0009951526800519746),
    (0.0, 0.0, 50000000.0, 0.0009766968356304253),
    (0.0, 0.0, 100000000.0, 0.0009567627392758064),
    (0.0, 10.0, 0.0, 0.001000252532901333),
    (0.0, 10.0, 10000000.0, 0.0009955384707565221),
    (0.0, 10.0, 50000000.0, 0.0009781135429989803),
    (0.0, 10.0, 100000000.0, 0.0009591793226656737),
    (0.0, 25.0, 0.0, 0.001002651736909511),
    (0.0, 25.0, 10000000.0, 0.0009982150112459267),
    (0.0, 25.0, 50000000.0, 0.0009817902360308535),
    (0.0, 25.0, 100000000.0, 0.0009638905840587952),
    (0.0, 40.0, 0.0, 0.0010071199508986843),
    (0.0, 40.0, 10000000.0, 0.0010028317075411553),
    (0.0, 40.0, 50000000.0, 0.0009869592500916945),
    (0.0, 40.0, 100000000.0, 0.0009697227505933956),
    (10.0, -2.0, 0.0, 0.0009922310155187658),
    (10.0, -2.0, 10000000.0, 0.000987329874309625),
    (10.0, -2.0, 50000000.0, 0.0009692492757296707),
    (10.0, -2.0, 100000000.0, 0.0009497210180332533),
    (10.0, 0.0, 0.0, 0.0009921454284539403),
    (10.0, 0.0, 10000000.0, 0.000987311820153943),
    (10.0, 0.0, 50000000.0, 0.0009694702682280057),
    (10.0, 0.0, 100000000.0, 0.0009501680107993519),
    (10.0, 10.0, 0.0, 0.0009925502687351075),
    (10.0, 10.0, 10000000.0, 0.00098798865124528),
    (10.0, 10.0, 50000000.0, 0.00097110982370768),
    (10.0, 10.0, 100000000.0, 0.0009527245350196568),
    (10.0, 25.0, 0.0, 0.0009952647821283827),
    (10.0, 25.0, 10000000.0, 0.000990960096429761),
    (10.0, 25.0, 50000000.0, 0.0009749994447512924),
    (10.0, 25.0, 100000000.0, 0.0009575386766713104),
    (10.0, 40.0, 0.0, 0.0009999284680955547),
    (10.0, 40.0, 10000000.0, 0.0009957574046846479),
    (10.0, 40.0, 50000000.0, 0.0009802834294974018),
    (10.0, 40.0, 100000000.0, 0.0009633830380241698),
    (30.0, -2.0, 0.0, 0.0009765527625926493),
    (30.0, -2.0, 10000000.0, 0.0009719792865924209),
    (30.0, -2.0, 50000000.0, 0.0009550888409369906),
    (30.0, -2.0, 100000000.0, 0.0009368022529344925),
    (30.0, 0.0, 0.0, 0.0009765987231087922),
    (30.0, 0.0, 10000000.0, 0.0009720846069343094),
    (30.0, 0.0, 50000000.0, 0.0009554035333949825),
    (30.0, 0.0, 100000000.0, 0.0009373111723876956),
    (30.0, 10.0, 0.0, 0.0009775583602442928),
    (30.0, 10.0, 10000000.0, 0.0009732819627722665),
    (30.0, 10.0, 50000000.0, 0.0009574381183348409),
    (30.0, 10.0, 100000000.0, 0.0009401245908328854),
    (30.0, 25.0, 0.0, 0.0009808525389777417),
    (30.0, 25.0, 10000000.0, 0.0009767957249867058),
    (30.0, 25.0, 50000000.0, 0.0009617271871917931),
    (30.0, 25.0, 100000000.0, 0.0009451632467783684),
    (30.0, 40.0, 0.0, 0.0009858962250259618),
    (30.0, 40.0, 10000000.0, 0.0009819500818592285),
    (30.0, 40.0, 50000000.0, 0.0009672700044086998),
    (30.0, 40.0, 100000000.0, 0.0009511182212055129),
    (35.16504, -2.0, 0.0, 0.0009725842559530334),
    (35.16504, -2.0, 10000000.0, 0.0009680916686611181),
    (35.16504, -2.0, 50000000.0, 0.0009514925784146791),
    (35.16504, -2.0, 100000000.0, 0.0009335035407274817),
    (35.16504, 0.0, 0.0, 0.0009726613854843871),
    (35.16504, 0.0, 10000000.0, 0.0009682261107263717),
    (35.16504, 0.0, 50000000.0, 0.000951829051061725),
    (35.16504, 0.0, 100000000.0, 0.0009340266379353848),
    (35.16504, 10.0, 0.0, 0.0009737549967980532),
    (35.16504, 10.0, 10000000.0, 0.000969548853578212),
    (35.16504, 10.0, 50000000.0, 0.0009539579646358982),
    (35.16504, 10.0, 100000000.0, 0.000936901301710562),
    (35.16504, 25.0, 0.0, 0.0009771893386798505),
    (35.16504, 25.0, 10000000.0, 0.0009731936509232546),
    (35.16504, 25.0, 50000000.0, 0.0009583435431232801),
    (35.16504, 25.0, 100000000.0, 0.0009419952850140042),
    (35.16504, 40.0, 0.0, 0.0009823297412856838),
    (35.16504, 40.0, 10000000.0, 0.000978439681099858),
    (35.16504, 40.0, 50000000.0, 0.0009639563322375555),
    (35.16504, 40.0, 100000000.0, 0.0009479871705152489),
    (42.0, -2.0, 0.0, 0.0009673804943573197),
    (42.0, -2.0, 10000000.0, 0.0009629927436722599),
    (42.0, -2.0, 50000000.0, 0.000946767992345977),
    (42.0, -2.0, 100000000.0, 0.0009291529790929428),
    (42.0, 0.0, 0.0, 0.0009674972906886833),
    (42.0, 0.0, 10000000.0, 0.0009631642010561112),
    (42.0, 0.0, 50000000.0, 0.0009471319865909975),
    (42.0, 0.0, 100000000.0, 0.0009296938145443213),
    (42.0, 10.0, 0.0, 0.0009687623271594553),
    (42.0, 10.0, 10000000.0, 0.0009646472585832862),
    (42.0, 10.0, 50000000.0, 0.0009493810588688104),
    (42.0, 10.0, 100000000.0, 0.0009326459921330039),
    (42.0, 25.0, 0.0, 0.0009723760573812169),
    (42.0, 25.0, 10000000.0, 0.000968459766005569),
    (42.0, 25.0, 50000000.0, 0.0009538900954644975),
    (42.0, 25.0, 100000000.0, 0.0009378105160302806),
    (42.0, 40.0, 0.0, 0.0009776448352444408),
    (42.0, 40.0, 10000000.0, 0.0009738280257172011),
    (42.0, 40.0, 50000000.0, 0.0009595982606481873),
    (42.0, 40.0, 100000000.0, 0.000943855961984835),
]


def test_teos10_sweep_regression():
    """The 75-term polynomial across its domain vs the recorded table."""
    sa, ct, p, v_ref = (jnp.asarray(c) for c in zip(*_TEOS10_SWEEP))
    v = eos.teos10_specvol(ct, sa, p)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               rtol=1e-13, atol=0)


def test_teos10_physical_signs_domainwide():
    """Haline contraction and compressibility keep their physical signs
    over the whole (SA, CT, p) domain; thermal expansion is positive
    everywhere except cold fresh water (the density-maximum anomaly,
    which the polynomial must reproduce: fresh water is densest near
    4 C at surface pressure)."""
    sa, ct, p = np.meshgrid(np.linspace(0.0, 42.0, 9),
                            np.linspace(-2.0, 40.0, 9),
                            np.linspace(0.0, 1.0e8, 9), indexing="ij")
    sa, ct, p = (jnp.asarray(a) for a in (sa, ct, p))
    eps_t, eps_s, eps_p = 1e-3, 1e-3, 1e2
    dv_dt = (eos.teos10_specvol(ct + eps_t, sa, p)
             - eos.teos10_specvol(ct - eps_t, sa, p)) / (2 * eps_t)
    dv_ds = (eos.teos10_specvol(ct, sa + eps_s, p)
             - eos.teos10_specvol(ct, sa - eps_s, p)) / (2 * eps_s)
    dv_dp = (eos.teos10_specvol(ct, sa, p + eps_p)
             - eos.teos10_specvol(ct, sa, p - eps_p)) / (2 * eps_p)
    assert bool(jnp.all(dv_ds < 0))          # saltier -> denser
    assert bool(jnp.all(dv_dp < 0))          # compressible
    # thermal expansion positive wherever water is warm (below the
    # density-maximum temperature T_md ~ 4 C - 0.22*SA it flips sign,
    # which is physical — cold brackish water expands on cooling)
    warm = ct > 5.0
    assert bool(jnp.all(jnp.where(warm, dv_dt, 1.0) > 0))
    # fresh-water density maximum near 4 C at surface pressure
    cts = jnp.linspace(0.0, 10.0, 101)
    rho = 1.0 / eos.teos10_specvol(cts, jnp.zeros_like(cts),
                                   jnp.zeros_like(cts))
    t_max = float(cts[int(jnp.argmax(rho))])
    assert 3.5 < t_max < 4.5
    assert abs(float(jnp.max(rho)) - 999.972) < 0.05
    # density range sanity over the whole domain
    rho_all = 1.0 / eos.teos10_specvol(ct, sa, p)
    assert bool(jnp.all(rho_all > 950.0)) and bool(jnp.all(rho_all < 1080.0))


def test_teos10_sound_speed():
    """c = sqrt(-v^2 / (dv/dp)) lands in the oceanographic 1400-1600 m/s
    band at representative ocean states (GSW sound-speed sanity)."""
    pts = [(35.0, 10.0, 1.0e7), (34.7, 2.0, 4.0e7), (35.16504, 0.0, 0.0),
           (36.0, 25.0, 0.0)]
    for sa_, ct_, p_ in pts:
        sa, ct, p = jnp.array(sa_), jnp.array(ct_), jnp.array(p_)
        eps = 1e2
        dv_dp = (eos.teos10_specvol(ct, sa, p + eps)
                 - eos.teos10_specvol(ct, sa, p - eps)) / (2 * eps)
        v = eos.teos10_specvol(ct, sa, p)
        c = float(jnp.sqrt(-v * v / dv_dp))
        assert 1400.0 < c < 1600.0, (sa_, ct_, p_, c)


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


# --------------- p-star remap + redistribution phase (r5) ---------------

def test_remap_piecewise_constant_analytic():
    """Column-analytic oracle: exact interval integrals of a piecewise-
    constant profile."""
    h_old = jnp.asarray([[2.0, 1.0, 1.0]])
    q = jnp.asarray([[1.0, 2.0, 3.0]])
    h_new = jnp.asarray([[1.0, 1.0, 2.0]])
    out = np.asarray(vert_coord.remap_piecewise_constant(h_old, h_new, q))
    # layers: [0,1) -> q=1; [1,2) -> q=1; [2,4) -> (1*2 + 1*3)/2 = 2.5
    np.testing.assert_allclose(out, [[1.0, 1.0, 2.5]], atol=1e-14)
    # identity remap
    same = np.asarray(vert_coord.remap_piecewise_constant(h_old, h_old, q))
    np.testing.assert_allclose(same, np.asarray(q), atol=1e-14)


def test_remap_conserves_content():
    rng = np.random.default_rng(7)
    C, K = 40, 8
    h_old = jnp.asarray(rng.uniform(0.5, 2.0, (C, K)))
    q = jnp.asarray(rng.standard_normal((C, K)))
    # new thicknesses with the same column totals
    w = rng.uniform(0.5, 2.0, (C, K))
    h_new = jnp.asarray(w / w.sum(1, keepdims=True)
                        * np.asarray(h_old).sum(1, keepdims=True))
    out = vert_coord.remap_piecewise_constant(h_old, h_new, q)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out * h_new, axis=1)),
        np.asarray(jnp.sum(q * h_old, axis=1)), rtol=1e-12)
    # layer means stay within the old range (donor remap is monotone)
    assert float(jnp.max(out)) <= float(jnp.max(q)) + 1e-12
    assert float(jnp.min(out)) >= float(jnp.min(q)) - 1e-12


def test_pstar_phase_fixed_point_and_conservation():
    """make_pstar_phase: the reference profile is a fixed point; a
    perturbed column redistributes onto the targets while conserving
    volume and tracer content exactly."""
    from omega_tpu.core.state import ModelState
    mesh = planar_hex_mesh(8, 8, dc=1000.0, bottom_depth=100.0)
    K, C, E = 5, mesh.ncells, mesh.nedges
    ref = np.full((C, K), 100.0 / K)
    wts = np.ones(K)
    phase = vert_coord.make_pstar_phase(mesh, ref, wts)

    rng = np.random.default_rng(3)
    tr = jnp.asarray(rng.standard_normal((2, C, K)) + 10.0)
    u = jnp.asarray(0.1 * rng.standard_normal((E, K)))

    # fixed point: h == ref stays put, tracers/velocity untouched
    st0 = ModelState(h=jnp.asarray(ref), u=u, tracers=tr)
    out0 = phase(st0)
    np.testing.assert_allclose(np.asarray(out0.h), ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(out0.tracers), np.asarray(tr),
                               atol=1e-10)

    # perturbed columns: total mass per column preserved, target
    # distributes the perturbation uniformly (uniform weights)
    ssh = rng.standard_normal(C)
    h_p = jnp.asarray(ref * (1.0 + ssh[:, None] / 100.0))
    st1 = ModelState(h=h_p, u=u, tracers=tr)
    out1 = phase(st1)
    np.testing.assert_allclose(np.asarray(out1.h).sum(1),
                               np.asarray(h_p).sum(1), rtol=1e-13)
    # uniform ref + uniform weights: every layer gets an equal share
    np.testing.assert_allclose(
        np.asarray(out1.h),
        np.broadcast_to(np.asarray(h_p).sum(1)[:, None] / K,
                        (C, K)), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out1.tracers * out1.h[None], axis=-1)),
        np.asarray(jnp.sum(tr * h_p[None], axis=-1)), rtol=1e-12)


def test_driver_pstar_run_conserves(tmp_path):
    """Driver-level p-star phase: a column-formulation run with
    PStarEnable conserves volume and tracer mass and stays finite."""
    import yaml

    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run
    tmp = str(tmp_path)
    doc = {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "Forward-Backward",
            "TimeStep": "0000_00:00:30",
            "StartTime": "0001-01-01_00:00:00",
            "StopTime": "0001-01-01_00:10:00", "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "planar", "Nx": 12, "Ny": 12,
                              "Dc": 5000.0, "F0": 1.0e-4,
                              "BottomDepth": 1000.0}},
        "VertCoord": {"NVertLayers": 4, "PStarEnable": True,
                      "MovementWeightType": "Uniform"},
        "SshFormulation": "Column",
        "Tracers": {"Base": ["Temperature", "Salinity"]},
        "Tendencies": {"ViscDel2": 1.0e3,
                       "VelHyperDiffTendencyEnable": False,
                       "TracerDiffTendencyEnable": False,
                       "TracerHyperDiffTendencyEnable": False},
        "IOStreams": {}}}
    p = f"{tmp}/omega.yml"
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)
    m = ocn_init(config_file=p, directory=tmp)
    # kick the state so the phase has something to redistribute
    x = np.asarray(m.mesh.x_cell)
    bump = 0.5 * np.exp(-((x - x.mean()) / 20e3) ** 2)
    h = np.asarray(m.state.h) + bump[:, None] / 4
    m.state = dataclasses_replace_state(m.state, h=jnp.asarray(h))
    area = np.asarray(m.mesh.area_cell)
    vol0 = float((area[:, None] * h).sum())
    tmass0 = (area[None, :, None] * np.asarray(m.state.tracers)
              * h[None]).sum(axis=(1, 2))
    m = ocn_run(m)
    st = ocn_finalize(m)
    h1 = np.asarray(st.h)
    assert np.isfinite(h1).all() and np.isfinite(np.asarray(st.u)).all()
    vol1 = float((area[:, None] * h1).sum())
    assert abs(vol1 - vol0) < 1e-9 * vol0
    tmass1 = (area[None, :, None] * np.asarray(st.tracers)
              * h1[None]).sum(axis=(1, 2))
    np.testing.assert_allclose(tmass1, tmass0, rtol=1e-11)


def test_driver_pstar_sharded_matches_single(tmp_path):
    """Sharded p-star (make_sharded_step post_phase: the phase runs per
    shard on scattered ref/mask rows, with one extra halo ring for its
    edge-radius-1 remap) matches the single-shard run on owned rows and
    conserves volume and tracer mass."""
    import yaml

    from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run

    def doc_for(nshards):
        d = {"Omega": {
            "TimeIntegration": {
                "CalendarType": "No Leap",
                "TimeStepper": "Forward-Backward",
                "TimeStep": "0000_00:00:30",
                "StartTime": "0001-01-01_00:00:00",
                "StopTime": "0001-01-01_00:05:00", "RunDuration": "none"},
            "Mesh": {"Generate": {"Kind": "planar", "Nx": 12, "Ny": 12,
                                  "Dc": 5000.0, "F0": 1.0e-4,
                                  "BottomDepth": 1000.0}},
            "VertCoord": {"NVertLayers": 4, "PStarEnable": True,
                          "MovementWeightType": "Uniform"},
            "SshFormulation": "Column",
            "Tracers": {"Base": ["Temperature", "Salinity"]},
            "Tendencies": {"ViscDel2": 1.0e3,
                           "VelHyperDiffTendencyEnable": False,
                           "TracerDiffTendencyEnable": False,
                           "TracerHyperDiffTendencyEnable": False},
            "IOStreams": {}}}
        if nshards > 1:
            d["Omega"]["Decomp"] = {"NShards": nshards, "Method": "sfc"}
        return d

    outs = {}
    for ns in (1, 4):
        tmp = str(tmp_path / f"s{ns}")
        import os
        os.makedirs(tmp, exist_ok=True)
        p = f"{tmp}/omega.yml"
        with open(p, "w") as f:
            yaml.safe_dump(doc_for(ns), f)
        m = ocn_init(config_file=p, directory=tmp)
        x = np.asarray(m.mesh.x_cell)
        bump = 0.5 * np.exp(-((x - x.mean()) / 20e3) ** 2)
        h = np.asarray(m.state.h) + bump[:, None] / 4
        m.state = dataclasses_replace_state(m.state, h=jnp.asarray(h))
        area = np.asarray(m.mesh.area_cell)
        vol0 = float((area[:, None] * h).sum())
        m = ocn_run(m)
        outs[ns] = (ocn_finalize(m), vol0, area)

    (st1, vol0, area), (st4, _, _) = outs[1], outs[4]
    for fld in ("h", "u", "tracers"):
        a = np.asarray(getattr(st4, fld))
        b = np.asarray(getattr(st1, fld))
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10 * np.abs(b).max())
    vol1 = float((area[:, None] * np.asarray(st4.h)).sum())
    assert abs(vol1 - vol0) < 1e-9 * vol0


def dataclasses_replace_state(st, **kw):
    import dataclasses as _dc
    try:
        return _dc.replace(st, **kw)
    except TypeError:
        d = {"h": st.h, "u": st.u, "tracers": st.tracers}
        d.update(kw)
        return type(st)(**d)


def test_initial_vert_coord_stream(tmp_path):
    """InitialVertCoord read stream (configs/Default.yml:64-72,
    VertCoord.cpp:149-206): 1-based min/max layer indices and bottom
    depth come from the file (MPAS variable-name aliases), drive the
    layer bounds and the default rest state."""
    import yaml

    from omega_tpu.driver import ocn_init
    from omega_tpu.io.netcdf import write_netcdf
    tmp = str(tmp_path)
    C = 12 * 12
    K = 4
    rng = np.random.default_rng(0)
    min_c = np.ones(C, np.int32)
    max_c = np.full(C, K, np.int32)
    max_c[:10] = 2                       # 10 shallow columns
    min_c[5:8] = 2                       # a few ice-shelf-like columns
    depth = np.full(C, 800.0)
    depth[:10] = 400.0
    write_netcdf(f"{tmp}/vcoord.nc",
                 dims={"nCells": C},
                 variables={"minLevelCell": min_c,
                            "maxLevelCell": max_c,
                            "bottomDepth": depth},
                 var_dims={"minLevelCell": ("nCells",),
                           "maxLevelCell": ("nCells",),
                           "bottomDepth": ("nCells",)})
    doc = {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "Forward-Backward",
            "TimeStep": "0000_00:00:30",
            "StartTime": "0001-01-01_00:00:00",
            "StopTime": "0001-01-01_00:01:00", "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "planar", "Nx": 12, "Ny": 12,
                              "Dc": 5000.0, "BottomDepth": 1000.0}},
        "VertCoord": {"NVertLayers": K},
        "Tracers": {"Base": ["Temperature", "Salinity"]},
        "Tendencies": {"ViscDel2": 0.0,
                       "VelHyperDiffTendencyEnable": False,
                       "TracerDiffTendencyEnable": False,
                       "TracerHyperDiffTendencyEnable": False},
        "IOStreams": {"InitialVertCoord": {
            "UsePointerFile": False, "Filename": "vcoord.nc",
            "Mode": "read", "Freq": 1, "FreqUnits": "OnStartup",
            "Contents": ["InitVertCoord"]}}}}
    p = f"{tmp}/omega.yml"
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)
    m = ocn_init(config_file=p, directory=tmp)
    lb = m.layer_bounds
    assert lb is not None
    np.testing.assert_array_equal(np.asarray(lb.min_cell), min_c - 1)
    np.testing.assert_array_equal(np.asarray(lb.max_cell), max_c - 1)
    # bottom depth overridden from the file
    np.testing.assert_allclose(np.asarray(m.mesh.bottom_depth), depth)
    # ...INCLUDING the static fast-path metadata: the stale uniform-
    # scalar entry used to keep trisk.col returning the construction
    # depth (1000.0) on structured meshes — silently wrong ssh gradient
    from omega_tpu.ops import trisk as _trisk
    col = np.asarray(_trisk.col(m.mesh, "bottom_depth"))
    col_arr = np.full(C, col.item()) if col.size == 1 else col.reshape(C)
    np.testing.assert_allclose(col_arr, depth)
    # default rest state: depth/K on active layers, 0 on inactive
    h = np.asarray(m.state.h)
    np.testing.assert_allclose(h[20], 800.0 / K)   # full column
    np.testing.assert_allclose(h[0, 3], 0.0)       # below maxLevel=2
    np.testing.assert_allclose(h[0, 0], 400.0 / K)
    np.testing.assert_allclose(h[6, 0], 0.0)       # above minLevel=2
