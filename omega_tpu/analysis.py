"""Online analysis: global energetics and tracer budget time series.

The reference reserves an `analysis` layer but ships it empty
(src/analysis/README.md); its science diagnostics live in the external
Polaris suites.  This module brings the core budget diagnostics
in-model, computed with the decomposition-invariant double-double sums
of parallel/reductions.py and written as a CSV time series on an alarm
cadence (driver config group `Analysis`).

Conservation facts the monitors rest on (Ringler et al. 2010):
  * volume and thickness-weighted tracer content are conserved to
    roundoff by the flux-form updates;
  * total energy  E = sum_k sum_c A_c [ h ke + g/2 (ssh - <ssh>_0)^2 ]
    is conserved by the TRiSK spatial discretization (the momentum
    force is -g grad ssh, so ssh is the energy's surface elevation in
    BOTH ssh formulations) up to time-discretization error;
  * potential enstrophy  Z = 1/2 sum_v A_v (xi + f)^2 / h_v  is NOT
    conserved by the reference's energy-conserving PV flux — it is
    reported as a boundedness diagnostic, not a budget.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from omega_tpu.core.config import ModelConfig
from omega_tpu.core.state import ModelState
from omega_tpu.mesh.horz_mesh import HorzMesh
from omega_tpu.ops import trisk
from omega_tpu.parallel.reductions import (global_max, global_min,
                                           global_sum)


def energetics(mesh: HorzMesh, cfg: ModelConfig, state: ModelState,
               ssh_ref: float = 0.0) -> Dict[str, float]:
    """Global budget scalars for one state (host-returned floats).

    ssh_ref: constant reference elevation subtracted from ssh before
    squaring (use the initial area-mean; volume conservation keeps the
    mean constant, so the subtraction changes PE by a constant and
    keeps d(KE+PE)/dt = 0 while avoiding catastrophic cancellation)."""
    h, u = state.h, state.u
    area = jnp.asarray(mesh.area_cell)[:, None]
    area_v = jnp.asarray(mesh.area_triangle)[:, None]

    ke_cell = trisk.ke_cell(mesh, u)                       # (C, K)
    if cfg.ssh_formulation == "column":
        ssh = (jnp.sum(h, axis=-1, keepdims=True)
               - trisk.col(mesh, "bottom_depth"))
    else:
        ssh = h - trisk.col(mesh, "bottom_depth")
    eta = ssh - ssh_ref

    xi = trisk.curl_vertex(mesh, u)                        # (V, K)
    h_v = trisk.cell_to_vertex_kite(mesh, h)
    f_v = jnp.asarray(mesh.f_vertex)[:, None]
    absv = xi + f_v

    out = {
        "volume": global_sum(area * h),
        "kinetic_energy": global_sum(area * h * ke_cell),
        "potential_energy": 0.5 * cfg.gravity * global_sum(area * eta * eta),
        "potential_enstrophy": 0.5 * global_sum(
            area_v * absv * absv / h_v),
    }
    for l in range(state.tracers.shape[0]):
        tr = state.tracers[l]
        out[f"tracer{l}_mass"] = global_sum(area * h * tr)
        out[f"tracer{l}_min"] = float(jnp.min(tr))
        out[f"tracer{l}_max"] = float(jnp.max(tr))
    out = {k: float(v) for k, v in out.items()}
    # host-side add: under jit XLA fuses a traced ke + 0.5*g*S into an FMA
    # with different last-bit rounding, so both samplers derive the total
    # from the hosted parts to keep the bitwise invariance contract
    out["total_energy"] = out["kinetic_energy"] + out["potential_energy"]
    return out


def energetics_local(mesh_l, cfg: ModelConfig, state: ModelState,
                     own_c, own_v, ssh_ref, axis_name: str = "x"):
    """Per-shard energetics INSIDE shard_map — the sharded counterpart of
    `energetics` (no global gather: each shard computes its owned-masked
    partial terms on its local mesh, halos fresh from the last exchange,
    and the double-double psum combines them). Removes the
    global-state-per-sample chokepoint of sharded runs (the reference
    computes norms the same way, per rank + MPI reduction,
    test/ocn/OceanTestCommon.h:396-560).

    own_c/own_v: (Cl,)/(Vl,) owned masks. Returns a dict of traced
    scalars; the caller hosts them after the shard_map returns."""
    h, u = state.h, state.u
    area = jnp.asarray(mesh_l.area_cell)[:, None]
    area_v = jnp.asarray(mesh_l.area_triangle)[:, None]
    mc = own_c[:, None] > 0
    mv = own_v[:, None] > 0

    ke_cell = trisk.ke_cell(mesh_l, u)
    if cfg.ssh_formulation == "column":
        ssh = (jnp.sum(h, axis=-1, keepdims=True)
               - trisk.col(mesh_l, "bottom_depth"))
    else:
        ssh = h - trisk.col(mesh_l, "bottom_depth")
    eta = ssh - ssh_ref

    xi = trisk.curl_vertex(mesh_l, u)
    h_v = trisk.cell_to_vertex_kite(mesh_l, h)
    f_v = jnp.asarray(mesh_l.f_vertex)[:, None]
    absv = xi + f_v

    gs = lambda v, m: global_sum(v, axis_name, mask=m)
    out = {
        "volume": gs(area * h, mc),
        "kinetic_energy": gs(area * h * ke_cell, mc),
        "potential_energy": 0.5 * cfg.gravity * gs(area * eta * eta, mc),
        "potential_enstrophy": 0.5 * gs(area_v * absv * absv / h_v, mv),
    }
    for l in range(state.tracers.shape[0]):
        tr = state.tracers[l]
        out[f"tracer{l}_mass"] = gs(area * h * tr, mc)
        out[f"tracer{l}_min"] = global_min(tr, axis_name, mask=mc)
        out[f"tracer{l}_max"] = global_max(tr, axis_name, mask=mc)
    return out


def mean_ssh_local(mesh_l, cfg: ModelConfig, state: ModelState, own_c,
                   axis_name: str = "x"):
    """Sharded area-mean ssh (traced scalar; see mean_ssh)."""
    area = jnp.asarray(mesh_l.area_cell)[:, None]
    h = state.h
    mc = own_c[:, None] > 0
    if cfg.ssh_formulation == "column":
        ssh = (jnp.sum(h, axis=-1, keepdims=True)
               - trisk.col(mesh_l, "bottom_depth"))
    else:
        ssh = h - trisk.col(mesh_l, "bottom_depth")
    num = global_sum(area * ssh, axis_name, mask=mc)
    # broadcast the area over ssh's lanes so the denominator carries the
    # same total-area (x K in stacked form) factor as mean_ssh's
    den = global_sum(jnp.broadcast_to(area, ssh.shape), axis_name,
                     mask=mc)
    return num / den


def mean_ssh(mesh: HorzMesh, cfg: ModelConfig, state: ModelState) -> float:
    """Area-mean ssh (the natural ssh_ref, fixed at t=0 by volume
    conservation)."""
    area = jnp.asarray(mesh.area_cell)[:, None]
    h = state.h
    if cfg.ssh_formulation == "column":
        ssh = (jnp.sum(h, axis=-1, keepdims=True)
               - trisk.col(mesh, "bottom_depth"))
    else:
        ssh = h - trisk.col(mesh, "bottom_depth")
    # denominator through the same order-invariant sum as mean_ssh_local
    # so sharded and gathered paths agree bit-for-bit
    denom = float(global_sum(jnp.broadcast_to(area, ssh.shape)))
    return float(global_sum(area * ssh)) / denom


class EnergeticsMonitor:
    """Alarm-driven CSV writer of the energetics time series.

    Created by the driver from the `Analysis` config group; `sample`
    is called at segment boundaries when its alarm rings (the analysis
    cadence chunks the jitted run loop exactly like an IOStream
    alarm)."""

    def __init__(self, mesh, cfg, path: str):
        self.mesh, self.cfg, self.path = mesh, cfg, path
        self.ssh_ref = None
        self._wrote_header = False

    def sample(self, state: ModelState, time_str: str) -> Dict[str, float]:
        if self.ssh_ref is None:
            self.ssh_ref = mean_ssh(self.mesh, self.cfg, state)
        # sorted keys: identical CSV schema to the sharded sampler
        row = dict(sorted(energetics(self.mesh, self.cfg, state,
                                     self.ssh_ref).items()))
        self.write_row(row, time_str)
        return row

    def write_row(self, row: Dict[str, float], time_str: str) -> None:
        """Append one precomputed row (the sharded sampler's entry: the
        scalars come off a shard_map'd reduction, no global gather).
        Columns are canonicalized to sorted key order HERE so the
        sharded sampler (which appends total_energy last) and the
        single-device sample emit identical CSV schemas."""
        row = dict(sorted(row.items()))
        mode = "a" if self._wrote_header else "w"
        with open(self.path, mode) as f:
            if not self._wrote_header:
                f.write("time," + ",".join(row) + "\n")
                self._wrote_header = True
            f.write(time_str + ","
                    + ",".join(repr(v) for v in row.values()) + "\n")
