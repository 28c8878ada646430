"""Structure-preserving decomposition of uniform planar hex meshes.

The general decomposition (decomp.py) renumbers each shard's local mesh,
which drops it off the structured fast path — on TPU that forfeits the
~3x conv-stencil advantage precisely where performance matters most.
This module shards the (ny, nx) grid into row bands instead:

  * shard s owns cell rows [s*band, (s+1)*band); its local domain adds
    `hw` halo rows above and below, so the local mesh IS a
    planar_hex_mesh(nx, band + 2*hw) — fully structured, conv path on
  * the local periodic wrap across the band seam produces garbage only
    in the outermost halo rows, exactly the owned+halo redundancy model
    of the reference (compute over NCellsAll, exchange refreshes halos)
  * halo width hw = 4 rows (>= the width-3 contract; even so the row
    parity phase of the hex stagger is preserved across shards)
  * the exchange is two ppermutes of contiguous row blocks — no index
    lists at all: all element classes and tracers ride one stacked
    (1 + 3 + L, hw, nx, K) bundle per direction

Restrictions (asserted): ny % nshards == 0, band even and >= hw, f-plane
(uniform Coriolis — beta-plane rows would need per-shard f arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from omega_tpu.core.config import ModelConfig
from omega_tpu.core.state import ModelState
from omega_tpu.mesh.horz_mesh import HorzMesh
from omega_tpu.mesh.planar import planar_hex_mesh
from omega_tpu.ops import structured

HW = 4   # halo rows (>= reference HaloWidth 3; even preserves parity)


@dataclasses.dataclass(frozen=True)
class StructuredShards:
    nshards: int
    nx: int
    ny: int
    band: int                    # owned rows per shard
    hw: int
    local_mesh: HorzMesh         # planar_hex_mesh(nx, band + 2*hw), shared
    global_mesh: HorzMesh


def decompose_structured(mesh: HorzMesh, nshards: int,
                         hw: int = HW) -> StructuredShards:
    nx, ny = mesh.structured_nx, mesh.structured_ny
    if nx == 0:
        raise ValueError("mesh is not structured")
    if ny % nshards:
        raise ValueError(f"ny={ny} not divisible by {nshards} shards")
    band = ny // nshards
    if band % 2 or band < hw:
        raise ValueError(f"band={band} must be even and >= hw={hw}")
    if structured.uniform_scalar(mesh, "f_cell") is None:
        raise ValueError("structured sharding requires an f-plane mesh "
                         "(uniform Coriolis)")
    f0 = structured.uniform_scalar(mesh, "f_cell")
    depth = structured.uniform_scalar(mesh, "bottom_depth")
    local = planar_hex_mesh(nx, band + 2 * hw, dc=mesh.structured_dc,
                            f0=f0, bottom_depth=depth)
    return StructuredShards(nshards=nshards, nx=nx, ny=ny, band=band,
                            hw=hw, local_mesh=local, global_mesh=mesh)


# ----------------------------------------------------------------------
# state scatter/gather (host side)

def _rows(ss: StructuredShards, s: int) -> np.ndarray:
    """Global row indices (wrapped) of shard s's local rows."""
    start = s * ss.band - ss.hw
    return (start + np.arange(ss.band + 2 * ss.hw)) % ss.ny


def _split_field(ss: StructuredShards, f, nper: int):
    """(..., nper*ny*nx, K) -> (S, ..., nper*nyl*nx, K)."""
    f = np.asarray(f)
    K = f.shape[-1]
    lead = f.shape[:-2]
    g = f.reshape(lead + (nper, ss.ny, ss.nx, K))
    outs = []
    for s in range(ss.nshards):
        loc = g[..., :, _rows(ss, s), :, :]
        nyl = ss.band + 2 * ss.hw
        outs.append(loc.reshape(lead + (nper * nyl * ss.nx, K)))
    return np.stack(outs)


def shard_state(ss: StructuredShards, state: ModelState) -> ModelState:
    return ModelState(
        h=jnp.asarray(_split_field(ss, state.h, 1)),
        u=jnp.asarray(_split_field(ss, state.u, 3)),
        tracers=jnp.asarray(_split_field(ss, state.tracers, 1)))


def gather_state(ss: StructuredShards, sstate: ModelState) -> ModelState:
    """Owned rows of every shard -> global state."""
    nyl = ss.band + 2 * ss.hw

    def merge(f, nper):
        f = np.asarray(f)                    # (S, ..., nper*nyl*nx, K)
        K = f.shape[-1]
        lead = f.shape[1:-2]
        g = f.reshape((ss.nshards,) + lead + (nper, nyl, ss.nx, K))
        owned = g[..., :, ss.hw:ss.hw + ss.band, :, :]
        out = np.concatenate([owned[s] for s in range(ss.nshards)],
                             axis=len(lead) + 1)
        return out.reshape(lead + (nper * ss.ny * ss.nx, K))

    return ModelState(h=jnp.asarray(merge(sstate.h, 1)),
                      u=jnp.asarray(merge(sstate.u, 3)),
                      tracers=jnp.asarray(merge(sstate.tracers, 1)))


# ----------------------------------------------------------------------
# device-side halo exchange: two row-block ppermutes

def _exchange_bundle(ss: StructuredShards, bundle, axis_name: str):
    """Row-halo refresh of a (T, nyl, nx, K) stacked grid array."""
    hw, S = ss.hw, ss.nshards
    if S > 1:
        # to s+1: rows [band, band+hw) -> their top halo [0, hw)
        up = jax.lax.ppermute(bundle[:, ss.band:ss.band + hw],
                              axis_name, [(i, (i + 1) % S) for i in range(S)])
        # to s-1: rows [hw, 2hw) -> their bottom halo [band+hw, band+2hw)
        dn = jax.lax.ppermute(bundle[:, hw:2 * hw],
                              axis_name, [(i, (i - 1) % S) for i in range(S)])
    else:
        up = bundle[:, ss.band:ss.band + hw]
        dn = bundle[:, hw:2 * hw]
    return jnp.concatenate([up, bundle[:, hw:ss.band + hw], dn], axis=1)


def _exchange_array(ss: StructuredShards, x, nper: int, axis_name: str):
    """Row-halo refresh of one element array (..., nper*nyl*nx, K)."""
    nyl = ss.band + 2 * ss.hw
    K = x.shape[-1]
    lead = x.shape[:-2]
    g = x.reshape((-1, nyl, ss.nx, K))
    g = _exchange_bundle(ss, g, axis_name)
    return g.reshape(lead + (nper * nyl * ss.nx, K))


def _exchange_rows(ss: StructuredShards, st: ModelState,
                   axis_name: str) -> ModelState:
    nx, hw = ss.nx, ss.hw
    nyl = ss.band + 2 * hw
    K = st.h.shape[-1]
    L = st.tracers.shape[0]

    h = st.h.reshape(1, nyl, nx, K)
    u = st.u.reshape(3, nyl, nx, K)
    tr = st.tracers.reshape(L, nyl, nx, K)
    bundle = jnp.concatenate([h, u, tr], axis=0)     # (4+L, nyl, nx, K)
    bundle = _exchange_bundle(ss, bundle, axis_name)
    h, u, tr = bundle[:1], bundle[1:4], bundle[4:]
    return ModelState(h=h.reshape(nyl * nx, K),
                      u=u.reshape(3 * nyl * nx, K),
                      tracers=tr.reshape(L, nyl * nx, K))


def make_sharded_step(ss: StructuredShards, cfg: ModelConfig, stepper,
                      device_mesh: Mesh, axis_name: str = "x",
                      wind_stress=None) -> Callable:
    """Jittable sharded step over the structured row-band decomposition.

    Every shard runs the SAME structured local mesh (conv/roll fast path
    stays on); the halo callback is the two row-block ppermutes."""
    pspec = P(axis_name)
    state_specs = ModelState(h=pspec, u=pspec, tracers=pspec)
    local = ss.local_mesh

    if wind_stress is not None:
        # per-cell (C,) global arrays -> stacked per-shard local rows
        wind_stress = tuple(
            jnp.asarray(_split_field(ss, np.asarray(w)[:, None], 1))[..., 0]
            for w in wind_stress)
    wspecs = (P() if wind_stress is None
              else tuple(pspec for _ in wind_stress))

    def local_step(state_stacked, wind_stacked, t, dt):
        st = jax.tree.map(lambda a: a[0], state_stacked)
        halo_fn = lambda s: _exchange_rows(ss, s, axis_name)
        # split-explicit subcycles refresh their own 2D fields through
        # these per-array exchanges (cells nper=1, edges nper=3)
        halo_fn.cell = lambda x: _exchange_array(ss, x, 1, axis_name)
        halo_fn.edge = lambda x: _exchange_array(ss, x, 3, axis_name)
        wind = (None if wind_stacked is None
                else tuple(w[0] for w in wind_stacked))
        out = stepper(local, cfg, st, t, dt, halo_fn, wind_stress=wind)
        return jax.tree.map(lambda a: a[None], out)

    sharded = jax.shard_map(local_step, mesh=device_mesh,
                            in_specs=(state_specs, wspecs, P(), P()),
                            out_specs=state_specs)
    return lambda st, t, dt: sharded(st, wind_stress, t, dt)
