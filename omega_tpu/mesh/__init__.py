from omega_tpu.mesh.horz_mesh import HorzMesh
from omega_tpu.mesh.planar import planar_hex_mesh
