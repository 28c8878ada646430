"""TRiSK operator accuracy tests.

Analogue of test/ocn/HorzOperatorsTest.cpp: operators applied to smooth
periodic analytic fields on planar hex meshes; errors must converge at the
theoretical order (div/grad/tangential ~2nd; vertex curl >=1st,
superconvergent on the uniform hex mesh). The reference pins L2/LInf
constants for its downloaded meshes; here we pin convergence *rates* on
the in-repo generated meshes, which is the same contract
(doc/design/OmegaV0ShallowWater.md:61-63).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from omega_tpu.mesh import planar_hex_mesh
from omega_tpu.ops import trisk

TWO_PI = 2.0 * np.pi


class Analytic:
    """psi = sin(kx x) sin(ky y); vector U = (cos(kx x) sin(ky y),
    sin(kx x) cos(ky y)) with exact div/curl."""

    def __init__(self, mesh):
        self.kx = TWO_PI / mesh.x_period
        self.ky = TWO_PI / mesh.y_period

    def scalar(self, x, y):
        return np.sin(self.kx * x) * np.sin(self.ky * y)

    def vec(self, x, y):
        return (np.cos(self.kx * x) * np.sin(self.ky * y),
                np.sin(self.kx * x) * np.cos(self.ky * y))

    def div(self, x, y):
        return -(self.kx + self.ky) * np.sin(self.kx * x) * np.sin(self.ky * y)

    def curl(self, x, y):
        return (self.kx - self.ky) * np.cos(self.kx * x) * np.cos(self.ky * y)

    def grad_x(self, x, y):
        return self.kx * np.cos(self.kx * x) * np.sin(self.ky * y)

    def grad_y(self, x, y):
        return self.ky * np.sin(self.kx * x) * np.cos(self.ky * y)


def _edge_normal_tangent(mesh):
    n = np.stack([np.cos(mesh.angle_edge), np.sin(mesh.angle_edge)], 1)
    t = np.stack([-np.sin(mesh.angle_edge), np.cos(mesh.angle_edge)], 1)
    return n, t


def _l2(err, exact):
    return np.sqrt(np.sum(err ** 2) / max(np.sum(exact ** 2), 1e-300))


def _errors(nx, dc):
    mesh = planar_hex_mesh(nx, nx, dc=dc)
    an = Analytic(mesh)
    n, t = _edge_normal_tangent(mesh)
    xe, ye = np.asarray(mesh.x_edge), np.asarray(mesh.y_edge)
    xc, yc = np.asarray(mesh.x_cell), np.asarray(mesh.y_cell)
    xv, yv = np.asarray(mesh.x_vertex), np.asarray(mesh.y_vertex)

    ux, uy = an.vec(xe, ye)
    u_normal = (n[:, 0] * ux + n[:, 1] * uy)[:, None]
    u_tangent = (t[:, 0] * ux + t[:, 1] * uy)

    scal = an.scalar(xc, yc)[:, None]

    div = np.asarray(trisk.div_cell(mesh, jnp.asarray(u_normal)))[:, 0]
    curl = np.asarray(trisk.curl_vertex(mesh, jnp.asarray(u_normal)))[:, 0]
    tang = np.asarray(trisk.tangential_edge(mesh, jnp.asarray(u_normal)))[:, 0]
    grad = np.asarray(trisk.grad_edge(mesh, jnp.asarray(scal)))[:, 0]

    grad_exact = n[:, 0] * an.grad_x(xe, ye) + n[:, 1] * an.grad_y(xe, ye)

    return {
        "div": _l2(div - an.div(xc, yc), an.div(xc, yc)),
        "curl": _l2(curl - an.curl(xv, yv), an.curl(xv, yv)),
        "tangential": _l2(tang - u_tangent, u_tangent),
        "grad": _l2(grad - grad_exact, grad_exact),
    }


@pytest.fixture(scope="module")
def conv_errors():
    L = 16000.0
    return _errors(16, L / 16), _errors(32, L / 32)


@pytest.mark.parametrize("op,min_order", [
    # vertex curl is 1st order (doc/design/OmegaV0ShallowWater.md:61-63)
    ("div", 1.8), ("grad", 1.8), ("curl", 0.9), ("tangential", 1.8),
])
def test_operator_convergence(conv_errors, op, min_order):
    coarse, fine = conv_errors
    order = np.log2(coarse[op] / fine[op])
    assert fine[op] < coarse[op], f"{op} error did not decrease"
    assert order > min_order, f"{op} convergence order {order:.2f} < {min_order}"


def test_uniform_flow_exact():
    """Uniform flow: div and curl are zero, tangential reconstruction exact."""
    mesh = planar_hex_mesh(8, 8, dc=1000.0)
    n, t = _edge_normal_tangent(mesh)
    for U in [(1.0, 0.0), (0.0, 1.0), (0.3, -0.7)]:
        u = (n @ np.array(U))[:, None]
        div = np.asarray(trisk.div_cell(mesh, jnp.asarray(u)))
        curl = np.asarray(trisk.curl_vertex(mesh, jnp.asarray(u)))
        tang = np.asarray(trisk.tangential_edge(mesh, jnp.asarray(u)))[:, 0]
        assert np.abs(div).max() < 1e-12
        assert np.abs(curl).max() < 1e-12
        assert np.abs(tang - t @ np.array(U)).max() < 1e-9


def test_interp_cell_to_edge():
    mesh = planar_hex_mesh(16, 16, dc=1000.0)
    an = Analytic(mesh)
    scal = an.scalar(np.asarray(mesh.x_cell), np.asarray(mesh.y_cell))[:, None]
    exact = an.scalar(np.asarray(mesh.x_edge), np.asarray(mesh.y_edge))
    aniso = np.asarray(trisk.interp_cell_to_edge_aniso(mesh, jnp.asarray(scal)))[:, 0]
    iso = np.asarray(trisk.interp_cell_to_edge_iso(mesh, jnp.asarray(scal)))[:, 0]
    assert _l2(aniso - exact, exact) < 0.05
    assert _l2(iso - exact, exact) < 0.05


def test_div_of_curl_free_gradient_symmetry():
    """curl(grad(psi)) must vanish to roundoff (TRiSK mimetic property)."""
    mesh = planar_hex_mesh(16, 16, dc=1000.0)
    an = Analytic(mesh)
    scal = an.scalar(np.asarray(mesh.x_cell), np.asarray(mesh.y_cell))[:, None]
    g = trisk.grad_edge(mesh, jnp.asarray(scal))
    curl_of_grad = np.asarray(trisk.curl_vertex(mesh, g))
    scale = np.abs(np.asarray(g)).max() / 1000.0
    assert np.abs(curl_of_grad).max() < 1e-12 * max(scale, 1.0)
