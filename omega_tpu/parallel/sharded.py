"""SPMD execution of the dycore over a jax device mesh.

Replaces the reference's MPI rank model (base/MachEnv.h:36) with a 1-D
jax.sharding.Mesh over the spatial axis: each device holds one owned+halo
local mesh (see decomp.py) and steppers run unchanged inside shard_map with
the halo callback lowering to ICI collectives (the updateTimeLevels halo
exchange of ocn/OceanState.cpp:333-365 and the RK4 mid-step refresh).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from omega_tpu.core.config import ModelConfig
from omega_tpu.core.state import ModelState
from omega_tpu.parallel import halo as halo_mod
from omega_tpu.parallel.decomp import ShardedMesh


def shard_state(smesh: ShardedMesh, state: ModelState) -> ModelState:
    """Scatter a global state into stacked per-shard local states (host)."""
    c = np.maximum(np.asarray(smesh.cell_local_to_global), 0)
    e = np.maximum(np.asarray(smesh.edge_local_to_global), 0)
    h = np.asarray(state.h)[c]                      # (S, Cl, K)
    u = np.asarray(state.u)[e]                      # (S, El, K)
    tr = np.asarray(state.tracers)                  # (L, C, K)
    tr_l = np.moveaxis(tr[:, c], 1, 0)              # (S, L, Cl, K)
    return ModelState(h=jnp.asarray(h), u=jnp.asarray(u),
                      tracers=jnp.asarray(tr_l))


def gather_state(smesh: ShardedMesh, sstate: ModelState,
                 ncells: int, nedges: int) -> ModelState:
    """Reassemble the global state from owned shard entries (host)."""
    c_l2g = np.asarray(smesh.cell_local_to_global)
    e_l2g = np.asarray(smesh.edge_local_to_global)
    c_own = np.asarray(smesh.owned_cell_mask) > 0
    e_own = np.asarray(smesh.owned_edge_mask) > 0
    h_l = np.asarray(sstate.h)
    u_l = np.asarray(sstate.u)
    tr_l = np.asarray(sstate.tracers)               # (S, L, Cl, K)

    K = h_l.shape[-1]
    L = tr_l.shape[1]
    h = np.zeros((ncells, K), h_l.dtype)
    u = np.zeros((nedges, K), u_l.dtype)
    tr = np.zeros((L, ncells, K), tr_l.dtype)
    for s in range(smesh.nshards):
        cm, em = c_own[s], e_own[s]
        h[c_l2g[s, cm]] = h_l[s, cm]
        u[e_l2g[s, em]] = u_l[s, em]
        tr[:, c_l2g[s, cm]] = tr_l[s][:, cm]
    return ModelState(h=jnp.asarray(h), u=jnp.asarray(u), tracers=jnp.asarray(tr))


def make_halo_fn(sm: ShardedMesh, axis_name: str = "x") -> Callable:
    """Per-shard halo exchange for a ModelState (call inside shard_map with
    an *unstacked* ShardedMesh pytree)."""
    def halo_fn(st: ModelState) -> ModelState:
        h = halo_mod.exchange(st.h, sm.cell_send_idx, sm.cell_recv_src_shard,
                              sm.cell_recv_src_slot, sm.cell_recv_dst, axis_name)
        u = halo_mod.exchange(st.u, sm.edge_send_idx, sm.edge_recv_src_shard,
                              sm.edge_recv_src_slot, sm.edge_recv_dst, axis_name)
        tr = halo_mod.exchange(st.tracers, sm.cell_send_idx,
                               sm.cell_recv_src_shard, sm.cell_recv_src_slot,
                               sm.cell_recv_dst, axis_name)
        return ModelState(h=h, u=u, tracers=tr)
    return halo_fn


def make_sharded_step(smesh: ShardedMesh, cfg: ModelConfig, stepper,
                      device_mesh: Mesh, axis_name: str = "x"):
    """Build a jittable sharded step: (sharded ModelState, t, dt) -> state.

    The same pure stepper used on a single device runs inside shard_map on
    each local mesh; its `halo` callback is the ICI exchange.
    """
    pspec = P(axis_name)
    smesh_specs = jax.tree.map(lambda _: pspec, smesh)
    state_specs = ModelState(h=pspec, u=pspec, tracers=pspec)

    def local_step(sm_stacked, state_stacked, t, dt):
        sm = jax.tree.map(lambda a: a[0], sm_stacked)
        st = jax.tree.map(lambda a: a[0], state_stacked)
        halo_fn = make_halo_fn(sm, axis_name)
        out = stepper(sm.mesh, cfg, st, t, dt, halo_fn)
        return jax.tree.map(lambda a: a[None], out)

    sharded = jax.shard_map(
        local_step, mesh=device_mesh,
        in_specs=(smesh_specs, state_specs, P(), P()),
        out_specs=state_specs)

    def step(state, t, dt):
        return sharded(smesh, state, t, dt)

    return step


def default_device_mesh(nshards: int, axis_name: str = "x") -> Mesh:
    devs = jax.devices()[:nshards]
    if len(devs) < nshards:
        raise ValueError(f"need {nshards} devices, have {len(jax.devices())}")
    return Mesh(np.array(devs), (axis_name,))
