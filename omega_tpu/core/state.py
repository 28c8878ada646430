"""Prognostic model state.

The reference keeps LayerThickness / NormalVelocity as vectors of device
arrays over 2-5 time levels with a circular index (ocn/OceanState.h:78-89)
and all tracers in one (tracer, cell, layer) array per level
(ocn/Tracers.h:48-51). In functional JAX the time levels disappear: the
state is a single immutable pytree and steppers are pure
state -> state maps (double buffering is the XLA compiler's job).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omega_tpu.mesh.horz_mesh import HorzMesh


class ModelState(NamedTuple):
    h: jax.Array        # (C, K)    layer thickness
    u: jax.Array        # (E, K)    normal velocity
    tracers: jax.Array  # (L, C, K) tracer concentrations


def init_state(mesh: HorzMesh, nvertlayers: int, ntracers: int,
               dtype=jnp.float64) -> ModelState:
    """Resting state: uniform thickness column = bottom depth, zero flow."""
    h = jnp.broadcast_to(
        (mesh.bottom_depth / nvertlayers).astype(dtype)[:, None],
        (mesh.ncells, nvertlayers))
    u = jnp.zeros((mesh.nedges, nvertlayers), dtype)
    tr = jnp.zeros((ntracers, mesh.ncells, nvertlayers), dtype)
    return ModelState(h=h, u=u, tracers=tr)
