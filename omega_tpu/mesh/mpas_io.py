"""MPAS-format mesh file reading and writing.

The reference reads MPAS NetCDF mesh files (QU240 global, Icos sphere,
48x48 periodic planar) through PIO in Decomp::readMesh (base/Decomp.cpp:
108-390) and HorzMesh's constructor (ocn/HorzMesh.cpp:49-148). Here one
host-side reader loads the whole mesh into a HorzMesh pytree (decomposition
happens afterwards in omega_tpu.parallel.decomp), and a writer emits
MPAS-format files so generated meshes interoperate with the reference
tooling (and serve as test fixtures).

MPAS conventions handled: 1-based connectivity with 0 padding (converted to
0-based with -1 padding), per-file `on_a_sphere`/`sphere_radius`/
`x_period`/`y_period` attributes, optional fields defaulted (Coriolis,
bottomDepth) when absent.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from omega_tpu.infra.errors import IOError_
from omega_tpu.io.netcdf import NCFile, read_netcdf, write_netcdf
from omega_tpu.mesh.horz_mesh import HorzMesh, finalize_mesh


def _conn(nc: NCFile, name: str) -> np.ndarray:
    """MPAS 1-based connectivity (0 = missing) -> 0-based (-1 = missing)."""
    return np.asarray(nc.get(name), np.int64) - 1


def _yes(attr) -> bool:
    if isinstance(attr, (bytes, str)):
        s = attr.decode() if isinstance(attr, bytes) else attr
        return s.strip().upper() in ("YES", "TRUE", "1")
    return bool(attr)


def read_mpas_mesh(path: str, *,
                   defaults: Optional[Dict[str, float]] = None) -> HorzMesh:
    """Load an MPAS mesh file into a HorzMesh.

    Mirrors the union of Decomp::readMesh (connectivity) and the HorzMesh
    constructor reads (coordinates, areas, dv/dc, angleEdge, weightsOnEdge,
    kiteAreas, Coriolis, bottomDepth); derived quantities (edge signs,
    masks, fused stencil weights) are recomputed by finalize_mesh exactly
    as HorzMesh.cpp:527-604 recomputes them after reading.
    """
    nc = read_netcdf(path)
    defaults = defaults or {}

    C = int(nc.dims["nCells"])
    E = int(nc.dims["nEdges"])
    V = int(nc.dims["nVertices"])
    M = int(nc.dims["maxEdges"])
    D = int(nc.dims["vertexDegree"])

    on_sphere = _yes(nc.attrs.get("on_a_sphere", "NO"))
    sphere_radius = float(nc.attrs.get("sphere_radius", 0.0) or 0.0)
    x_period = float(nc.attrs.get("x_period", 0.0) or 0.0)
    y_period = float(nc.attrs.get("y_period", 0.0) or 0.0)

    def opt(name, shape, default=0.0):
        if nc.has(name):
            return np.asarray(nc.get(name), np.float64)
        return np.full(shape, defaults.get(name, default), np.float64)

    raw = dict(
        x_cell=np.asarray(nc.get("xCell"), np.float64),
        y_cell=np.asarray(nc.get("yCell"), np.float64),
        lon_cell=opt("lonCell", C),
        lat_cell=opt("latCell", C),
        area_cell=np.asarray(nc.get("areaCell"), np.float64),
        f_cell=opt("fCell", C),
        bottom_depth=opt("bottomDepth", C, 1000.0),
        n_edges_on_cell=np.asarray(nc.get("nEdgesOnCell"), np.int64),
        edges_on_cell=_conn(nc, "edgesOnCell"),
        cells_on_cell=_conn(nc, "cellsOnCell"),
        vertices_on_cell=_conn(nc, "verticesOnCell"),
        x_edge=np.asarray(nc.get("xEdge"), np.float64),
        y_edge=np.asarray(nc.get("yEdge"), np.float64),
        lon_edge=opt("lonEdge", E),
        lat_edge=opt("latEdge", E),
        dc_edge=np.asarray(nc.get("dcEdge"), np.float64),
        dv_edge=np.asarray(nc.get("dvEdge"), np.float64),
        angle_edge=opt("angleEdge", E),
        f_edge=opt("fEdge", E),
        cells_on_edge=_conn(nc, "cellsOnEdge"),
        vertices_on_edge=_conn(nc, "verticesOnEdge"),
        n_edges_on_edge=np.asarray(nc.get("nEdgesOnEdge"), np.int64),
        edges_on_edge=_conn(nc, "edgesOnEdge"),
        weights_on_edge=np.asarray(nc.get("weightsOnEdge"), np.float64),
        x_vertex=np.asarray(nc.get("xVertex"), np.float64),
        y_vertex=np.asarray(nc.get("yVertex"), np.float64),
        lon_vertex=opt("lonVertex", V),
        lat_vertex=opt("latVertex", V),
        area_triangle=np.asarray(nc.get("areaTriangle"), np.float64),
        f_vertex=opt("fVertex", V),
        cells_on_vertex=_conn(nc, "cellsOnVertex"),
        edges_on_vertex=_conn(nc, "edgesOnVertex"),
        kite_areas_on_vertex=np.asarray(nc.get("kiteAreasOnVertex"),
                                        np.float64),
    )
    if nc.has("meshScalingDel2"):
        raw["mesh_scaling_del2"] = np.asarray(nc.get("meshScalingDel2"),
                                              np.float64)
    if nc.has("meshScalingDel4"):
        raw["mesh_scaling_del4"] = np.asarray(nc.get("meshScalingDel4"),
                                              np.float64)

    return finalize_mesh(raw, ncells=C, nedges=E, nvertices=V, max_edges=M,
                         vertex_degree=D, on_sphere=on_sphere,
                         sphere_radius=sphere_radius,
                         x_period=x_period, y_period=y_period)


def write_mpas_mesh(mesh: HorzMesh, path: str, fmt: str = "netcdf3") -> None:
    """Write a HorzMesh as an MPAS-format mesh file (1-based connectivity)."""
    C, E, V = mesh.ncells, mesh.nedges, mesh.nvertices

    def conn1(arr, valid=None):
        """0-based with clamped padding -> MPAS 1-based with 0 padding.

        finalize_mesh clamps padded slots to 0 (a valid id), so the true
        padding is recovered from `valid` masks derived below from the
        sign/weight arrays, which finalize_mesh zeroes exactly on padding.
        """
        out = np.asarray(arr, np.int64) + 1
        return out if valid is None else np.where(valid, out, 0)

    a = lambda name: np.asarray(getattr(mesh, name))
    n_eoc = a("n_edges_on_cell").astype(np.int64)
    M = mesh.max_edges
    pad_c = np.arange(M)[None, :] >= n_eoc[:, None]

    # Slot validity on boundary meshes (periodic/sphere meshes have no
    # padding in these arrays and every mask below is all-True):
    # finalize_mesh zeroes edge_sign_on_cell / edge_sign_on_vertex /
    # kite_areas_on_vertex precisely on padded slots, and an (edge, cell) /
    # (edge, vertex) adjacency is real iff it appears in the transposed
    # connectivity with a nonzero sign.
    eoc0 = a("edges_on_cell").astype(np.int64)
    eov0 = a("edges_on_vertex").astype(np.int64)
    coe0 = a("cells_on_edge").astype(np.int64)
    voe0 = a("vertices_on_edge").astype(np.int64)
    valid_eoc = (a("edge_sign_on_cell") != 0.0) & ~pad_c
    valid_eov = a("edge_sign_on_vertex") != 0.0
    valid_cov = a("kite_areas_on_vertex") != 0.0

    valid_coe = np.zeros((E, 2), bool)
    e_f = eoc0[valid_eoc]
    c_f = np.broadcast_to(np.arange(C)[:, None], eoc0.shape)[valid_eoc]
    for i in (0, 1):
        hit = coe0[e_f, i] == c_f
        valid_coe[e_f[hit], i] = True

    valid_voe = np.zeros((E, 2), bool)
    e_f = eov0[valid_eov]
    v_f = np.broadcast_to(np.arange(V)[:, None], eov0.shape)[valid_eov]
    for i in (0, 1):
        hit = voe0[e_f, i] == v_f
        valid_voe[e_f[hit], i] = True

    # cellsOnCell[c, j] is the cell across edgesOnCell[c, j]: padded when
    # that edge is a boundary edge (one adjacent cell missing)
    interior_edge = a("edge_mask") > 0.0
    valid_coc = valid_eoc & interior_edge[np.where(valid_eoc, eoc0, 0)]

    def conn_cell(arr):
        """Cell connectivity: zero out padded slots per nEdgesOnCell."""
        out = np.asarray(arr, np.int64) + 1
        return np.where(pad_c, 0, out)

    n_eoe = a("n_edges_on_edge").astype(np.int64)
    pad_e = np.arange(mesh.max_edges * 2)[None, :] >= n_eoe[:, None]

    dims = dict(nCells=C, nEdges=E, nVertices=V, maxEdges=M,
                maxEdges2=2 * M, vertexDegree=mesh.vertex_degree, TWO=2)
    variables = {
        "xCell": a("x_cell"), "yCell": a("y_cell"),
        "zCell": np.zeros(C), "lonCell": a("lon_cell"),
        "latCell": a("lat_cell"), "areaCell": a("area_cell"),
        "fCell": a("f_cell"), "bottomDepth": a("bottom_depth"),
        "nEdgesOnCell": n_eoc.astype(np.int32),
        "edgesOnCell": conn_cell(a("edges_on_cell")),
        "cellsOnCell": conn1(a("cells_on_cell"), valid_coc),
        "verticesOnCell": conn_cell(a("vertices_on_cell")),
        "xEdge": a("x_edge"), "yEdge": a("y_edge"), "zEdge": np.zeros(E),
        "lonEdge": a("lon_edge"), "latEdge": a("lat_edge"),
        "dcEdge": a("dc_edge"), "dvEdge": a("dv_edge"),
        "angleEdge": a("angle_edge"), "fEdge": a("f_edge"),
        "cellsOnEdge": conn1(a("cells_on_edge"), valid_coe),
        "verticesOnEdge": conn1(a("vertices_on_edge"), valid_voe),
        "nEdgesOnEdge": n_eoe.astype(np.int32),
        "edgesOnEdge": np.where(pad_e, 0, conn1(a("edges_on_edge"))),
        "weightsOnEdge": np.where(pad_e, 0.0, a("weights_on_edge")),
        "meshScalingDel2": a("mesh_scaling_del2"),
        "meshScalingDel4": a("mesh_scaling_del4"),
        "xVertex": a("x_vertex"), "yVertex": a("y_vertex"),
        "zVertex": np.zeros(V), "lonVertex": a("lon_vertex"),
        "latVertex": a("lat_vertex"), "areaTriangle": a("area_triangle"),
        "fVertex": a("f_vertex"),
        "cellsOnVertex": conn1(a("cells_on_vertex"), valid_cov),
        "edgesOnVertex": conn1(a("edges_on_vertex"), valid_eov),
        "kiteAreasOnVertex": a("kite_areas_on_vertex"),
    }
    var_dims = {
        "xCell": ("nCells",), "yCell": ("nCells",), "zCell": ("nCells",),
        "lonCell": ("nCells",), "latCell": ("nCells",),
        "areaCell": ("nCells",), "fCell": ("nCells",),
        "bottomDepth": ("nCells",), "nEdgesOnCell": ("nCells",),
        "edgesOnCell": ("nCells", "maxEdges"),
        "cellsOnCell": ("nCells", "maxEdges"),
        "verticesOnCell": ("nCells", "maxEdges"),
        "xEdge": ("nEdges",), "yEdge": ("nEdges",), "zEdge": ("nEdges",),
        "lonEdge": ("nEdges",), "latEdge": ("nEdges",),
        "dcEdge": ("nEdges",), "dvEdge": ("nEdges",),
        "angleEdge": ("nEdges",), "fEdge": ("nEdges",),
        "cellsOnEdge": ("nEdges", "TWO"),
        "verticesOnEdge": ("nEdges", "TWO"),
        "nEdgesOnEdge": ("nEdges",),
        "edgesOnEdge": ("nEdges", "maxEdges2"),
        "weightsOnEdge": ("nEdges", "maxEdges2"),
        "meshScalingDel2": ("nEdges",), "meshScalingDel4": ("nEdges",),
        "xVertex": ("nVertices",), "yVertex": ("nVertices",),
        "zVertex": ("nVertices",), "lonVertex": ("nVertices",),
        "latVertex": ("nVertices",), "areaTriangle": ("nVertices",),
        "fVertex": ("nVertices",),
        "cellsOnVertex": ("nVertices", "vertexDegree"),
        "edgesOnVertex": ("nVertices", "vertexDegree"),
        "kiteAreasOnVertex": ("nVertices", "vertexDegree"),
    }
    attrs = {
        "on_a_sphere": "YES" if mesh.on_sphere else "NO",
        "sphere_radius": float(mesh.sphere_radius),
        "x_period": float(mesh.x_period),
        "y_period": float(mesh.y_period),
        "mesh_spec": "1.0",
        "source": "omega_tpu mesh generator",
    }
    write_netcdf(path, dims=dims, variables=variables, var_dims=var_dims,
                 attrs=attrs, fmt=fmt)
