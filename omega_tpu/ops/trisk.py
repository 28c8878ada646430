"""TRiSK horizontal stencil operators — TPU-native formulation.

The reference implements these as per-element Kokkos functors with inner
neighbor loops (ocn/HorzOperators.h:9-187). Here every operator is a
whole-array weighted gather: neighbor indices are static (C, M) int32 arrays
(padded entries point at element 0 with weight 0), the vertical dimension K
rides the TPU lane axis, and XLA fuses gather + multiply + reduce into a
single HBM-bandwidth-bound sweep.

Field shape conventions: cell fields (C, K), edge fields (E, K),
vertex fields (V, K). Operators are linear maps between element classes.
"""

from __future__ import annotations

import jax.numpy as jnp

from omega_tpu.mesh.horz_mesh import HorzMesh


def _gather_sum(weights, idx, field):
    """sum_j weights[n, j] * field[idx[n, j], k] -> (n, K)."""
    return jnp.einsum("nj,njk->nk", weights, field[idx])


def div_cell(mesh: HorzMesh, vec_edge: jnp.ndarray) -> jnp.ndarray:
    """Divergence of an edge-normal vector field at cell centers.

    div(c) = -(1/A_c) sum_e sign(c,e) dv_e u_e   (HorzOperators.h:9-42)
    """
    return _gather_sum(mesh.w_div_cell, mesh.edges_on_cell, vec_edge)


def grad_edge(mesh: HorzMesh, scalar_cell: jnp.ndarray) -> jnp.ndarray:
    """Normal gradient of a cell scalar on edges (HorzOperators.h:44-66)."""
    c0 = mesh.cells_on_edge[:, 0]
    c1 = mesh.cells_on_edge[:, 1]
    inv_dc = (1.0 / mesh.dc_edge)[:, None]
    return inv_dc * (scalar_cell[c1] - scalar_cell[c0])


def curl_vertex(mesh: HorzMesh, vec_edge: jnp.ndarray) -> jnp.ndarray:
    """Relative vorticity (curl) of an edge-normal field at vertices.

    curl(v) = (1/A_v) sum_e sign(v,e) dc_e u_e   (HorzOperators.h:68-102)
    """
    return _gather_sum(mesh.w_curl_vertex, mesh.edges_on_vertex, vec_edge)


def tangential_edge(mesh: HorzMesh, vec_edge: jnp.ndarray) -> jnp.ndarray:
    """Tangential velocity reconstruction on edges via TRiSK weights.

    t(e) = sum_{e'} w(e,e') u(e')   (HorzOperators.h:104-133)
    """
    return _gather_sum(mesh.weights_on_edge, mesh.edges_on_edge, vec_edge)


def interp_cell_to_edge_aniso(mesh: HorzMesh, scalar_cell: jnp.ndarray) -> jnp.ndarray:
    """Two-cell average onto edges (HorzOperators.h:158-164)."""
    c0 = mesh.cells_on_edge[:, 0]
    c1 = mesh.cells_on_edge[:, 1]
    return 0.5 * (scalar_cell[c0] + scalar_cell[c1])


def interp_cell_to_edge_iso(mesh: HorzMesh, scalar_cell: jnp.ndarray) -> jnp.ndarray:
    """Kite-area-weighted interpolation onto edges (HorzOperators.h:166-183).

    Averages over the cells of both end vertices with kite-area weights.
    """
    voe = mesh.vertices_on_edge                      # (E, 2)
    kites = mesh.kite_areas_on_vertex                # (V, D)
    cov = mesh.cells_on_vertex                       # (V, D)
    k_e = kites[voe]                                 # (E, 2, D)
    vals = scalar_cell[cov[voe]]                     # (E, 2, D, K?) or (E,2,D)
    if vals.ndim == 3:
        accum = jnp.einsum("eld,eld->e", k_e, vals)
        return accum / jnp.sum(k_e, axis=(1, 2))
    accum = jnp.einsum("eld,eldk->ek", k_e, vals)
    return accum / jnp.sum(k_e, axis=(1, 2))[:, None]
