"""Regression-pinned operator error constants.

Mirrors the reference's HorzOperatorsTest hard-coded expected errors
(test/ocn/HorzOperatorsTest.cpp:33-44,84-95): discretization errors on
fixed meshes are deterministic, so any drift beyond roundoff means the
discretization changed. Constants recorded from the current
implementation on the 48x48 planar mesh (the OmegaPlanarMesh analogue)
and the icos-16 sphere.
"""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.mesh.spherical import spherical_icos_mesh
from omega_tpu.ops import trisk

RTOL = 1e-6    # allow roundoff-level drift only


def _norms(a, b):
    return (np.linalg.norm(a - b) / np.linalg.norm(b),
            np.abs(a - b).max() / np.abs(b).max())


@pytest.fixture(scope="module")
def planar48():
    return planar_hex_mesh(48, 48, dc=1.0)


@pytest.fixture(scope="module")
def sphere16():
    return spherical_icos_mesh(16)


def test_planar_pinned(planar48):
    m = planar48
    kx = 2 * np.pi / m.x_period
    ky = 2 * np.pi / m.y_period
    xc, yc = np.asarray(m.x_cell), np.asarray(m.y_cell)
    xe, ye = np.asarray(m.x_edge), np.asarray(m.y_edge)
    xv, yv = np.asarray(m.x_vertex), np.asarray(m.y_vertex)
    ang = np.asarray(m.angle_edge)

    psi_c = np.sin(kx * xc) * np.sin(ky * yc)
    gx = kx * np.cos(kx * xe) * np.sin(ky * ye)
    gy = ky * np.sin(kx * xe) * np.cos(ky * ye)
    got = np.asarray(trisk.grad_edge(m, jnp.asarray(psi_c[:, None])))[:, 0]
    l2, li = _norms(got, gx * np.cos(ang) + gy * np.sin(ang))
    np.testing.assert_allclose(l2, 1.3435461112e-3, rtol=RTOL)
    np.testing.assert_allclose(li, 1.2502607188e-3, rtol=RTOL)

    Fe = np.sin(kx * xe) * np.sin(ky * ye) * np.cos(ang)
    got = np.asarray(trisk.div_cell(m, jnp.asarray(Fe[:, None])))[:, 0]
    l2, li = _norms(got, kx * np.cos(kx * xc) * np.sin(ky * yc))
    np.testing.assert_allclose(l2, 1.2489200649e-3, rtol=RTOL)
    np.testing.assert_allclose(li, 1.2489200649e-3, rtol=RTOL)

    got = np.asarray(trisk.curl_vertex(m, jnp.asarray(Fe[:, None])))[:, 0]
    l2, li = _norms(got, -np.sin(kx * xv) * ky * np.cos(ky * yv))
    np.testing.assert_allclose(l2, 2.7591945797e-3, rtol=RTOL)
    np.testing.assert_allclose(li, 2.7670149948e-3, rtol=RTOL)


def test_sphere_pinned(sphere16):
    m = sphere16
    R = m.sphere_radius
    latc, lonc = np.asarray(m.lat_cell), np.asarray(m.lon_cell)
    late, lone = np.asarray(m.lat_edge), np.asarray(m.lon_edge)
    ang = np.asarray(m.angle_edge)

    psi = np.sin(latc) * np.cos(latc) * np.cos(lonc)
    ge = -np.sin(late) * np.cos(late) * np.sin(lone) / (R * np.cos(late))
    gn = np.cos(2 * late) * np.cos(lone) / R
    got = np.asarray(trisk.grad_edge(m, jnp.asarray(psi[:, None])))[:, 0]
    l2, li = _norms(got, ge * np.cos(ang) + gn * np.sin(ang))
    np.testing.assert_allclose(l2, 9.5545970259e-4, rtol=RTOL)
    np.testing.assert_allclose(li, 1.0875747029e-3, rtol=RTOL)

    g = trisk.grad_edge(m, jnp.asarray(psi[:, None]))
    got = np.asarray(trisk.div_cell(m, g))[:, 0]
    l2, li = _norms(got, -6.0 / (R * R) * psi)
    np.testing.assert_allclose(l2, 3.0116770862e-3, rtol=RTOL)
    np.testing.assert_allclose(li, 4.4817905990e-3, rtol=RTOL)
