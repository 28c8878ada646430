"""Cross-validation against the reference implementation's own oracles.

The reference's HorzOperatorsTest pins hard-coded L2/L-inf error norms —
numbers RECORDED FROM RUNNING THE REFERENCE CODE — for each TRiSK operator
on the PlanarPeriodic48x48 fixture (a uniform doubly periodic hex mesh,
Lx=1, Ly=sqrt(3)/2; doc/devGuide/QuickStart.md:158). This file ports the
test exactly — analytic fields (HorzOperatorsTest.cpp:24-78), edge
projections (OceanTestCommon.h:201-222), the area-weighted relative error
norms (OceanTestCommon.h:396-560), and the double-precision tolerance
RTol=1e-10 (HorzOperatorsTest.cpp:474) — and requires OUR operators on OUR
generated 48x48 mesh to reproduce THEIR error constants
(HorzOperatorsTest.cpp:33-44). Agreement validates both the mesh geometry
(areas, angles, kites, weights) and all five operators against the
reference, without building it.

A full serial build of the reference is infeasible in this environment:
the Kokkos/ekat submodule is an empty directory, and MPI + netcdf-C +
parmetis are required at configure time with no network egress to fetch
them (see CROSSCHECK.md).
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.ops import trisk

# ---------------------------------------------------------------------------
# the reference's pinned oracle constants (HorzOperatorsTest.cpp:33-44),
# {LInf, L2} exactly as in ErrorMeasures initialization order
EXPECTED = {
    "div":          (0.00124886886594427027, 0.00124886886590974385),
    "grad":         (0.00125026071878537952, 0.00134354611117262204),
    "curl":         (0.161365663569699946, 0.161348016897141039),
    "recon":        (0.00450897496974901352, 0.00417367308684470691),
    "interp_aniso": (0.0026762081503380526, 0.003058198461518835),
    "interp_iso":   (0.004279097382993937, 0.004200067675522098),
}
RTOL = 1e-10      # sizeof(Real) == 8 branch, HorzOperatorsTest.cpp:474

LX = 1.0
LY = np.sqrt(3.0) / 2.0
TWO_PI = 2.0 * np.pi


# analytic fields (TestSetupPlane, HorzOperatorsTest.cpp:46-78)
def exact_scalar(x, y):
    return np.sin(TWO_PI * x / LX) * np.sin(TWO_PI * y / LY)


def exact_grad(x, y):
    gx = TWO_PI / LX * np.cos(TWO_PI * x / LX) * np.sin(TWO_PI * y / LY)
    gy = TWO_PI / LY * np.sin(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY)
    return gx, gy


def exact_vec(x, y):
    vx = np.sin(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY)
    vy = np.cos(TWO_PI * x / LX) * np.sin(TWO_PI * y / LY)
    return vx, vy


def exact_div_vec(x, y):
    return TWO_PI * (1.0 / LX + 1.0 / LY) * np.cos(TWO_PI * x / LX) * \
        np.cos(TWO_PI * y / LY)


def exact_curl_vec(x, y):
    return TWO_PI * (-1.0 / LX + 1.0 / LY) * np.sin(TWO_PI * x / LX) * \
        np.sin(TWO_PI * y / LY)


def error_measures(num, exact, area):
    """Area-weighted relative (LInf, L2) exactly as computeErrors
    (OceanTestCommon.h:396-560)."""
    diff = np.abs(num - exact)
    linf = diff.max() / np.abs(exact).max()
    l2 = np.sqrt(np.sum(area * diff ** 2) / np.sum(area * exact ** 2))
    return linf, l2


@pytest.fixture(scope="module")
def setup():
    mesh = planar_hex_mesh(48, 48, dc=LX / 48.0)
    xc, yc = np.asarray(mesh.x_cell), np.asarray(mesh.y_cell)
    xe, ye = np.asarray(mesh.x_edge), np.asarray(mesh.y_edge)
    xv, yv = np.asarray(mesh.x_vertex), np.asarray(mesh.y_vertex)
    angle = np.asarray(mesh.angle_edge)
    area_cell = np.asarray(mesh.area_cell)
    area_vertex = np.asarray(mesh.area_triangle)
    area_edge = np.asarray(mesh.dc_edge) * np.asarray(mesh.dv_edge) / 2.0

    vx, vy = exact_vec(xe, ye)
    vec_n = np.cos(angle) * vx + np.sin(angle) * vy       # normal proj
    vec_t = -np.sin(angle) * vx + np.cos(angle) * vy      # tangential proj
    return dict(mesh=mesh, xc=xc, yc=yc, xe=xe, ye=ye, xv=xv, yv=yv,
                angle=angle, area_cell=area_cell, area_vertex=area_vertex,
                area_edge=area_edge, vec_n=vec_n, vec_t=vec_t)


def _check(name, got):
    exp_linf, exp_l2 = EXPECTED[name]
    np.testing.assert_allclose(got[0], exp_linf, rtol=RTOL,
                               err_msg=f"{name} LInf")
    np.testing.assert_allclose(got[1], exp_l2, rtol=RTOL,
                               err_msg=f"{name} L2")


def test_divergence_matches_reference_oracle(setup):
    s = setup
    num = np.asarray(trisk.div_cell(s["mesh"], jnp.asarray(s["vec_n"][:, None])))[:, 0]
    exact = exact_div_vec(s["xc"], s["yc"])
    _check("div", error_measures(num, exact, s["area_cell"]))


def test_gradient_matches_reference_oracle(setup):
    s = setup
    scal = exact_scalar(s["xc"], s["yc"])
    num = np.asarray(trisk.grad_edge(s["mesh"], jnp.asarray(scal[:, None])))[:, 0]
    gx, gy = exact_grad(s["xe"], s["ye"])
    exact = np.cos(s["angle"]) * gx + np.sin(s["angle"]) * gy
    _check("grad", error_measures(num, exact, s["area_edge"]))


def test_curl_matches_reference_oracle(setup):
    s = setup
    num = np.asarray(trisk.curl_vertex(s["mesh"], jnp.asarray(s["vec_n"][:, None])))[:, 0]
    exact = exact_curl_vec(s["xv"], s["yv"])
    _check("curl", error_measures(num, exact, s["area_vertex"]))


def test_tangential_recon_matches_reference_oracle(setup):
    s = setup
    num = np.asarray(trisk.tangential_edge(s["mesh"], jnp.asarray(s["vec_n"][:, None])))[:, 0]
    _check("recon", error_measures(num, s["vec_t"], s["area_edge"]))


def test_interp_cell_to_edge_matches_reference_oracle(setup):
    s = setup
    scal = exact_scalar(s["xc"], s["yc"])
    exact = exact_scalar(s["xe"], s["ye"])
    aniso = np.asarray(trisk.interp_cell_to_edge_aniso(
        s["mesh"], jnp.asarray(scal[:, None])))[:, 0]
    iso = np.asarray(trisk.interp_cell_to_edge_iso(
        s["mesh"], jnp.asarray(scal[:, None])))[:, 0]
    _check("interp_aniso", error_measures(aniso, exact, s["area_edge"]))
    _check("interp_iso", error_measures(iso, exact, s["area_edge"]))


# ---------------------------------------------------------------------------
# TendencyTermsTest planar oracles (TendencyTermsTest.cpp:37-186, pinned
# {LInf, L2} recorded from the reference on the same 48x48 fixture;
# RTol = 1e-5 for doubles, TendencyTermsTest.cpp:1063)
EXPECTED_TEND = {
    "thick_flux_div":   (0.00124886886594453264, 0.00124886886590977139),
    "pot_vort_hadv":    (0.00807347170900282914, 0.00794755105765788429),
    "ke_grad":          (0.00125026071878537952, 0.00134354611117262161),
    "ssh_grad":         (0.00125026071878537952, 0.00134354611117262161),
    "vel_del2":         (0.00113090174765822192, 0.00134324628763667899),
    "vel_del4":         (0.00113090174765822192, 0.00134324628763667899),
    "tracer_horz_adv":  (0.00205864372747571571, 0.00172418025417940784),
    "tracer_del2":      (0.00334357193650093847, 0.00290978146207349032),
    "tracer_del4":      (0.00508833446725232875, 0.00523080740758275625),
    "bottom_drag":      (0.033848740052302935, 0.01000133508329411),
}
RTOL_TEND = 1e-5
GRAV = 9.80665
VISC_DEL2 = 1.0e3       # configs/Default.yml:38
VISC_DEL4 = 1.2e11      # configs/Default.yml:40
DRAG_COEFF = 1.123456789  # TendencyTermsTest.cpp:771
WIND_RHO = 0.987654321    # TendencyTermsTest.cpp:700


def _check_tend(name, got):
    exp_linf, exp_l2 = EXPECTED_TEND[name]
    np.testing.assert_allclose(got[0], exp_linf, rtol=RTOL_TEND,
                               err_msg=f"{name} LInf")
    np.testing.assert_allclose(got[1], exp_l2, rtol=RTOL_TEND,
                               err_msg=f"{name} L2")


# analytic fields beyond the operator set (TendencyTermsTest.cpp:95-180)
def layer_thick(x, y):
    return 2.0 + np.sin(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY)


def planetary_vort(x, y):
    return np.cos(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY)


def laplace_vec(x, y):
    lap = -4 * np.pi ** 2 * (1 / LX ** 2 + 1 / LY ** 2)
    return (lap * np.sin(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY),
            lap * np.cos(TWO_PI * x / LX) * np.sin(TWO_PI * y / LY))


def tracer_flux_div(x, y):
    cx, sx = np.cos(TWO_PI * x / LX), np.sin(TWO_PI * x / LX)
    cy, sy = np.cos(TWO_PI * y / LY), np.sin(TWO_PI * y / LY)
    return (TWO_PI / (LX * LY)) * (cx * (2 * (LX + LY) * cy
                                         + (LX + 2 * LY) * sx * cy ** 2
                                         - LX * sx * sy ** 2))


def scalar_a(x, y):
    return np.cos(TWO_PI * x / LX) * np.sin(TWO_PI * y / LY)


def scalar_b(x, y):
    return 2.0 + np.cos(TWO_PI * x / LX) * np.cos(TWO_PI * y / LY)


def scalar_c(x, y):
    return np.cos(TWO_PI * x / LX) ** 2 - np.sin(TWO_PI * y / LY) ** 2


def tracer_diff_exact(x, y):
    pi2 = np.pi ** 2
    return -4 * pi2 * np.sin(TWO_PI * y / LY) * (
        2 * (1 / LX ** 2 + 1 / LY ** 2) * np.cos(TWO_PI * x / LX)
        + (1 / LY ** 2 + (1 / LX ** 2 + 1 / LY ** 2)
           * np.cos(4 * np.pi * x / LX)) * np.cos(TWO_PI * y / LY))


def tracer_hyperdiff_exact(x, y):
    return -8 * np.pi ** 2 * (np.cos(4 * np.pi * x / LX) / LX ** 2
                              + np.cos(4 * np.pi * y / LY) / LY ** 2)


def _col(arr):
    return jnp.asarray(arr[:, None])


def test_thickness_flux_div_matches_reference_oracle(setup):
    s = setup
    num = -np.asarray(trisk.div_cell(s["mesh"], _col(s["vec_n"])))[:, 0]
    exact = -exact_div_vec(s["xc"], s["yc"])
    _check_tend("thick_flux_div",
                error_measures(num, exact, s["area_cell"]))


def test_pot_vort_hadv_matches_reference_oracle(setup):
    """PotentialVortHAdvOnEdge (TendencyTerms.h:70-130) via our split
    formulation pv = 0.5*(q*T[F] + T[F q]) (core/tendencies.py:67-77)."""
    s = setup
    xe, ye = s["xe"], s["ye"]
    ht = layer_thick(xe, ye)
    q = (exact_curl_vec(xe, ye) + planetary_vort(xe, ye)) / ht
    F = ht * s["vec_n"]
    tf = np.asarray(trisk.tangential_edge(s["mesh"], _col(F)))[:, 0]
    tfq = np.asarray(trisk.tangential_edge(s["mesh"], _col(F * q)))[:, 0]
    num = 0.5 * (q * tf + tfq)
    vx, vy = exact_vec(xe, ye)
    qh = (exact_curl_vec(xe, ye) / ht + planetary_vort(xe, ye) / ht) * ht
    exact = -np.sin(s["angle"]) * (qh * vx) + np.cos(s["angle"]) * (qh * vy)
    _check_tend("pot_vort_hadv", error_measures(num, exact, s["area_edge"]))


def test_ke_and_ssh_grad_match_reference_oracle(setup):
    s = setup
    scal = exact_scalar(s["xc"], s["yc"])
    grad = np.asarray(trisk.grad_edge(s["mesh"], _col(scal)))[:, 0]
    gx, gy = exact_grad(s["xe"], s["ye"])
    exact_n = np.cos(s["angle"]) * gx + np.sin(s["angle"]) * gy
    _check_tend("ke_grad", error_measures(-grad, -exact_n, s["area_edge"]))
    _check_tend("ssh_grad", error_measures(-GRAV * grad, -GRAV * exact_n,
                                           s["area_edge"]))


def _del2_edge(s, div_c, rvort_v):
    mesh = s["mesh"]
    d0, d1 = (np.asarray(a)[:, 0] for a in
              trisk.cell_pair_on_edge(mesh, _col(div_c)))
    r0, r1 = (np.asarray(a)[:, 0] for a in
              trisk.vertex_pair_on_edge(mesh, _col(rvort_v)))
    dc = np.asarray(mesh.dc_edge)
    dv = np.asarray(mesh.dv_edge)
    return (d1 - d0) / dc - (r1 - r0) / dv


def test_velocity_del2_del4_match_reference_oracle(setup):
    """VelocityDiffusionOnEdge / VelocityHyperDiffOnEdge
    (TendencyTerms.h:214-305) fed the exact div/curl, as the reference
    test does (TendencyTermsTest.cpp:559-696)."""
    s = setup
    div_c = exact_div_vec(s["xc"], s["yc"])
    rvort_v = exact_curl_vec(s["xv"], s["yv"])
    del2u = _del2_edge(s, div_c, rvort_v)
    lx, ly = laplace_vec(s["xe"], s["ye"])
    lap_n = np.cos(s["angle"]) * lx + np.sin(s["angle"]) * ly
    _check_tend("vel_del2", error_measures(VISC_DEL2 * del2u,
                                           VISC_DEL2 * lap_n,
                                           s["area_edge"]))
    _check_tend("vel_del4", error_measures(-VISC_DEL4 * del2u,
                                           -VISC_DEL4 * lap_n,
                                           s["area_edge"]))


def test_wind_forcing_matches_reference_formula(setup):
    """WindForcingOnEdge (TendencyTerms.h:~250): identical inputs must give
    identical output (the reference pins {0, 0} with ATol=100*eps)."""
    s = setup
    h_edge = scalar_b(s["xe"], s["ye"])
    num = s["vec_n"] / (WIND_RHO * h_edge)
    vx, vy = exact_vec(s["xe"], s["ye"])
    ex = np.cos(s["angle"]) * (vx / (h_edge * WIND_RHO)) + \
        np.sin(s["angle"]) * (vy / (h_edge * WIND_RHO))
    linf, l2 = error_measures(num, ex, s["area_edge"])
    assert linf < 100 * np.finfo(np.float64).eps
    assert l2 < 100 * np.finfo(np.float64).eps


def test_bottom_drag_matches_reference_oracle(setup):
    """BottomDragOnEdge (TendencyTerms.h:308-340)."""
    s = setup
    mesh = s["mesh"]
    ke_c = scalar_a(s["xc"], s["yc"]) ** 2 / 2.0
    ke0, ke1 = (np.asarray(a)[:, 0] for a in
                trisk.cell_pair_on_edge(mesh, _col(ke_c)))
    h_edge = scalar_b(s["xe"], s["ye"])
    num = -DRAG_COEFF * np.sqrt(ke0 + ke1) / h_edge * s["vec_n"]
    vx, vy = exact_vec(s["xe"], s["ye"])
    fac = -DRAG_COEFF * np.abs(scalar_a(s["xe"], s["ye"])) / \
        scalar_b(s["xe"], s["ye"])
    exact = np.cos(s["angle"]) * (fac * vx) + np.sin(s["angle"]) * (fac * vy)
    _check_tend("bottom_drag", error_measures(num, exact, s["area_edge"]))


def test_tracer_horz_adv_matches_reference_oracle(setup):
    """TracerHorzAdvOnCell (TendencyTerms.h:343-383) with the reference
    test's inputs (HTrOnEdge = -layerThick at edge centers)."""
    s = setup
    htr_edge = -layer_thick(s["xe"], s["ye"])
    num = -np.asarray(trisk.div_cell(
        s["mesh"], _col(htr_edge * s["vec_n"])))[:, 0]
    exact = tracer_flux_div(s["xc"], s["yc"])
    _check_tend("tracer_horz_adv",
                error_measures(num, exact, s["area_cell"]))


def test_tracer_del2_del4_match_reference_oracle(setup):
    """TracerDiffOnCell / TracerHyperDiffOnCell (TendencyTerms.h:386-492)
    via the shared weighted-cell-laplacian (core/aux.py:153-164)."""
    from omega_tpu.core.aux import _weighted_cell_laplacian
    s = setup
    mesh = s["mesh"]
    tr = scalar_a(s["xc"], s["yc"])
    h_edge = scalar_b(s["xe"], s["ye"])
    num2 = np.asarray(_weighted_cell_laplacian(
        mesh, jnp.asarray(h_edge)[:, None], _col(tr)))[:, 0]
    _check_tend("tracer_del2",
                error_measures(num2, tracer_diff_exact(s["xc"], s["yc"]),
                               s["area_cell"]))

    trc = scalar_c(s["xc"], s["yc"])
    num4 = -np.asarray(_weighted_cell_laplacian(mesh, 1.0, _col(trc)))[:, 0]
    _check_tend("tracer_del4",
                error_measures(num4,
                               -tracer_hyperdiff_exact(s["xc"], s["yc"]),
                               s["area_cell"]))


def test_linear_eos_matches_reference_value():
    """EosTest.cpp:41-42: linear specvol at SA=30, CT=10, p=1000 dbar."""
    from omega_tpu.core import eos
    c = eos.EosConfig(eos_type="linear")
    sv = eos.compute_spec_vol(c, jnp.asarray([[10.0]]), jnp.asarray([[30.0]]),
                              jnp.asarray([[1000.0]]))
    np.testing.assert_allclose(float(sv[0, 0]), 0.0009784735812133072,
                               rtol=1e-10)
