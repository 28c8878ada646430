from omega_tpu.ops.trisk import (
    div_cell,
    grad_edge,
    curl_vertex,
    tangential_edge,
    interp_cell_to_edge_aniso,
    interp_cell_to_edge_iso,
)
from omega_tpu.ops.tridiag import thomas, pcr, diffusion_solve
