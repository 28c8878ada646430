"""Spherical mesh + operator tests and MPAS mesh-file IO round trips.

Mirrors the reference's sphere-mesh operator validation
(test/ocn/HorzOperatorsTest.cpp sphere cases: spherical harmonics on
Icos meshes) and the mesh-file read path (base/Decomp.cpp readMesh +
ocn/HorzMesh.cpp reads).
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.mesh.mpas_io import read_mpas_mesh, write_mpas_mesh
from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.ops import trisk


@pytest.fixture(scope="module")
def sphere8():
    return spherical_icos_mesh(8)


@pytest.fixture(scope="module")
def sphere16():
    return spherical_icos_mesh(16)


def test_sphere_partition_of_unity(sphere8):
    """Voronoi cells and dual triangles each tile the sphere exactly;
    kites partition both cell and triangle areas."""
    m = sphere8
    R = m.sphere_radius
    total = 4 * np.pi * R * R
    assert abs(float(np.sum(m.area_cell)) / total - 1) < 1e-12
    assert abs(float(np.sum(m.area_triangle)) / total - 1) < 1e-12
    # kites around each vertex sum to the triangle area
    ksum = np.asarray(m.kite_areas_on_vertex).sum(axis=1)
    np.testing.assert_allclose(ksum, np.asarray(m.area_triangle), rtol=1e-12)
    # counts: 10n^2+2 cells, 12 pentagons
    assert m.ncells == 642 and m.nedges == 1920 and m.nvertices == 1280
    assert int((np.asarray(m.n_edges_on_cell) == 5).sum()) == 12


def _solid_body_normal(m, U0=1.0):
    lat_e = np.asarray(m.lat_edge)
    ang = np.asarray(m.angle_edge)
    ue = U0 * np.cos(lat_e)
    return (ue * np.cos(ang))[:, None], (-ue * np.sin(ang))[:, None]


def test_sphere_solid_body_rotation(sphere8):
    """Solid-body rotation: divergence ~ 0, curl = 2 U0 sin(lat)/R."""
    m = sphere8
    R = m.sphere_radius
    un, ut = _solid_body_normal(m)
    div = np.asarray(trisk.div_cell(m, jnp.asarray(un)))
    assert np.abs(div).max() < 0.01 * (1.0 / R)
    curl = np.asarray(trisk.curl_vertex(m, jnp.asarray(un)))[:, 0]
    exact = 2.0 / R * np.sin(np.asarray(m.lat_vertex))
    relerr = np.linalg.norm(curl - exact) / np.linalg.norm(exact)
    assert relerr < 0.01
    # tangential reconstruction approximates the true tangential flow
    trec = np.asarray(trisk.tangential_edge(m, jnp.asarray(un)))
    relerr_t = np.abs(trec - ut).max() / np.abs(ut).max()
    assert relerr_t < 0.08


def _harmonic_fields(m):
    """Y_2^1-flavored test function psi = sin(lat)cos(lat)cos(lon) and its
    gradient/laplacian on the sphere (all closed-form)."""
    R = m.sphere_radius
    latc, lonc = np.asarray(m.lat_cell), np.asarray(m.lon_cell)
    late, lone = np.asarray(m.lat_edge), np.asarray(m.lon_edge)
    psi_c = np.sin(latc) * np.cos(latc) * np.cos(lonc)
    # grad components at edges
    dpsi_dlat = np.cos(2 * late) * np.cos(lone)
    dpsi_dlon = -np.sin(late) * np.cos(late) * np.sin(lone)
    ge = dpsi_dlon / (R * np.cos(late))      # east component
    gn = dpsi_dlat / R                       # north component
    ang = np.asarray(m.angle_edge)
    grad_n = ge * np.cos(ang) + gn * np.sin(ang)
    # laplacian of a degree-2 spherical harmonic: -l(l+1)/R^2 psi
    lap_c = -6.0 / (R * R) * psi_c
    return psi_c, grad_n, lap_c


@pytest.mark.parametrize("op", ["grad", "div"])
def test_sphere_operator_convergence(sphere8, sphere16, op):
    """grad and div(grad) converge on the Y_2^1 harmonic (2nd order for
    grad, >=1st for the cell laplacian, matching the reference's operator
    accuracy table OmegaV0ShallowWater.md:61-63)."""
    errs = []
    for m in (sphere8, sphere16):
        psi_c, grad_n, lap_c = _harmonic_fields(m)
        if op == "grad":
            got = np.asarray(trisk.grad_edge(m, jnp.asarray(psi_c[:, None])))[:, 0]
            err = np.linalg.norm(got - grad_n) / np.linalg.norm(grad_n)
        else:
            g = trisk.grad_edge(m, jnp.asarray(psi_c[:, None]))
            got = np.asarray(trisk.div_cell(m, g))[:, 0]
            err = np.linalg.norm(got - lap_c) / np.linalg.norm(lap_c)
        errs.append(err)
    order = np.log2(errs[0] / errs[1])
    min_order = 1.6 if op == "grad" else 0.9
    assert order > min_order, (errs, order)


def test_mpas_roundtrip_planar(tmp_path):
    """write_mpas_mesh -> read_mpas_mesh preserves geometry, connectivity,
    and operator results on the periodic planar mesh."""
    m = planar_hex_mesh(8, 8, dc=1000.0, f0=1e-4)
    p = str(tmp_path / "planar.nc")
    write_mpas_mesh(m, p)
    m2 = read_mpas_mesh(p)
    assert m2.ncells == m.ncells and m2.nedges == m.nedges
    assert m2.x_period == m.x_period and not m2.on_sphere
    np.testing.assert_allclose(np.asarray(m2.area_cell),
                               np.asarray(m.area_cell), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(m2.edges_on_cell),
                                  np.asarray(m.edges_on_cell))
    np.testing.assert_array_equal(np.asarray(m2.cells_on_edge),
                                  np.asarray(m.cells_on_edge))
    np.testing.assert_allclose(np.asarray(m2.weights_on_edge),
                               np.asarray(m.weights_on_edge), atol=1e-12)
    # derived quantities recomputed identically
    np.testing.assert_allclose(np.asarray(m2.w_div_cell),
                               np.asarray(m.w_div_cell), rtol=1e-12)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((m.nedges, 2)))
    np.testing.assert_allclose(np.asarray(trisk.div_cell(m2, u)),
                               np.asarray(trisk.div_cell(m, u)), rtol=1e-12)


def test_mpas_roundtrip_sphere(tmp_path, sphere8):
    """Sphere attributes (on_a_sphere, radius) and geodesic geometry
    survive the MPAS file round trip; hdf5 flavor too."""
    for fmt in ("netcdf3", "hdf5"):
        p = str(tmp_path / f"sphere_{fmt}.nc")
        write_mpas_mesh(sphere8, p, fmt=fmt)
        m2 = read_mpas_mesh(p)
        assert m2.on_sphere and m2.sphere_radius == sphere8.sphere_radius
        np.testing.assert_allclose(np.asarray(m2.area_cell),
                                   np.asarray(sphere8.area_cell), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(m2.kite_areas_on_vertex),
                                   np.asarray(sphere8.kite_areas_on_vertex),
                                   rtol=1e-10)
        np.testing.assert_array_equal(np.asarray(m2.edges_on_vertex),
                                      np.asarray(sphere8.edges_on_vertex))


def test_sphere_shallow_water_steps(sphere8):
    """A short global shallow-water run on the sphere stays finite and
    conserves volume (the cosine-bell-style smoke test)."""
    from omega_tpu.core import ModelConfig, ModelState, TendencyConfig
    from omega_tpu.stepping import run_steps

    m = sphere8
    K = 2
    cfg = ModelConfig(
        nvertlayers=K, ntracers=1,
        tendencies=TendencyConfig(visc_del2=0.0, velocity_diffusion=False,
                                  velocity_hyperdiff=False,
                                  tracer_diffusion=False,
                                  tracer_hyperdiff=False))
    latc = np.asarray(m.lat_cell)
    lonc = np.asarray(m.lon_cell)
    h0 = 4000.0 / K
    bump = 100.0 * np.exp(-((latc - 0.0) ** 2 + (lonc - 1.0) ** 2) / 0.3 ** 2)
    h = jnp.asarray(h0 + bump[:, None] / K) * jnp.ones((1, K))
    st = ModelState(h=h, u=jnp.zeros((m.nedges, K)),
                    tracers=15.0 + jnp.zeros((1, m.ncells, K)))
    area = np.asarray(m.area_cell)[:, None]
    vol0 = np.sum(area * np.asarray(st.h))
    out = jax.block_until_ready(
        jax.jit(lambda s: run_steps(m, cfg, s, 0.0, 60.0, 30))(st))
    vol1 = np.sum(area * np.asarray(out.h))
    assert np.isfinite(np.asarray(out.h)).all()
    assert abs(vol1 - vol0) / vol0 < 1e-13
    assert np.abs(np.asarray(out.u)).max() > 0
