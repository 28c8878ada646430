"""Coupled-mode component interface (the E3SM coupler analogue).

The reference is designed to run as an E3SM component — `MachEnv::init`
accepts a coupler-supplied communicator (base/MachEnv.h:136-142) and the
Omega-2 roadmap is the coupled configuration — but its own MCT/MOAB
wiring does not exist yet (SURVEY.md section 2.5).  This module is the
TPU-native equivalent of that component contract: a host "coupler"
(atmosphere model, test harness, ESM driver) constructs an
`OmegaComponent`, then alternates

    exports = comp.run(coupling_interval_seconds, imports)

calls with its own physics.  Imports/exports are plain global cell
arrays (the attribute-vector analogue); the component advances its own
exact-rational clock, fires its IO streams, and keeps the jitted run
segment cached across intervals (driver._run_ctx), so per-interval cost
is one segment execution, not a re-compile.

Import fields (all optional, (ncells,) float):
  zonal_wind_stress / merid_wind_stress   [N m-2] surface stress
    (requires Tendencies.WindForcingTendencyEnable in the config)

Export fields ((ncells,) float unless noted):
  ssh            sea surface height = sum_k h_k - bottom_depth  [m]
  sst / sss      surface Temperature / Salinity (when in the catalog)
  u_zonal, v_merid   surface velocity reconstructed at cell centers
  frazil/melt fluxes etc. have no analogue in the layered SW core.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Dict, Optional

import numpy as np

from omega_tpu.infra.time_manager import Alarm, TimeInterval


def reconstruct_cell_velocity(mesh, u):
    """Edge-normal velocity -> (zonal, meridional) vectors at cells.

    Each edge's full vector is rebuilt from its normal component and the
    TRiSK tangential reconstruction (ocn/HorzOperators.h:104-133), then
    averaged to cells with dc*dv/4 edge-area weights.  Exact for uniform
    flow (both projections are exact there and the weights normalize).
    Returns (u_zonal, v_merid), each (C, K) for (E, K) input.
    """
    import jax.numpy as jnp

    from omega_tpu.mesh.horz_mesh import unclamped_connectivity
    from omega_tpu.ops import trisk

    ut = trisk.tangential_edge(mesh, u)
    ang = jnp.asarray(mesh.angle_edge)[:, None]
    # n-hat = (cos a, sin a), t-hat = (-sin a, cos a) in (east, north)
    ve = u * jnp.cos(ang) - ut * jnp.sin(ang)
    vn = u * jnp.sin(ang) + ut * jnp.cos(ang)

    eoc = np.asarray(unclamped_connectivity(mesh)["edges_on_cell"])
    dc = np.asarray(mesh.dc_edge)
    dv = np.asarray(mesh.dv_edge)
    w = np.where(eoc >= 0, (dc * dv / 4.0)[np.maximum(eoc, 0)], 0.0)
    wj = jnp.asarray(w)[:, :, None]                       # (C, M, 1)
    idx = jnp.asarray(np.maximum(eoc, 0))
    wsum = jnp.sum(wj, axis=1)

    def avg(x):
        return jnp.sum(wj * x[idx], axis=1) / wsum

    return avg(ve), avg(vn)


class OmegaComponent:
    """Omega as a drivable component with import/export states.

    The init/run/finalize triplet of an E3SM component
    (ocn/OceanDriver.h:26-35): `__init__` = ocnInit from a config,
    `run(interval)` = ocnRun until a one-shot coupling alarm,
    `finalize()` = ocnFinalize.  The model's own IO streams (history,
    restart + pointer files) stay active underneath the coupler."""

    def __init__(self, config_file: Optional[str] = None, *,
                 config=None, directory: str = "."):
        from omega_tpu.driver import ocn_init
        self.model = ocn_init(config=config, config_file=config_file,
                              directory=directory)
        self._temp_idx = self._tracer_index("Temperature")
        self._salt_idx = self._tracer_index("Salinity")

    def _tracer_index(self, name: str) -> Optional[int]:
        try:
            return self.model.tracers.index_of(name)
        except (KeyError, ValueError, AttributeError):
            names = list(getattr(self.model.tracers, "names", []))
            return names.index(name) if name in names else None

    # ---- component contract ----

    def run(self, interval_seconds: float,
            imports: Optional[Dict[str, np.ndarray]] = None) -> Dict:
        """Advance the ocean by one coupling interval and return exports.

        The interval must be a whole number of time steps (the coupler
        sets the alarm cadence, exactly like an IOStream alarm)."""
        import jax.numpy as jnp

        model = self.model
        if imports:
            wz = imports.get("zonal_wind_stress")
            wm = imports.get("merid_wind_stress")
            if wz is not None or wm is not None:
                if not model.model_cfg.tendencies.wind_forcing:
                    raise ValueError(
                        "wind imports need Tendencies."
                        "WindForcingTendencyEnable: true in the config")
                C = model.mesh.ncells
                z = jnp.asarray(np.broadcast_to(
                    np.asarray(0.0 if wz is None else wz, np.float64), (C,)))
                m = jnp.asarray(np.broadcast_to(
                    np.asarray(0.0 if wm is None else wm, np.float64), (C,)))
                model.wind_stress = (z, m)
            unknown = set(imports) - {"zonal_wind_stress",
                                      "merid_wind_stress"}
            if unknown:
                raise ValueError(f"unknown import fields: {sorted(unknown)}")

        from omega_tpu.driver import ocn_run
        now = model.clock.get_current_time()
        ring = now + TimeInterval(seconds=Fraction(interval_seconds))
        cpl = Alarm("CouplingAlarm", ring_time=ring)
        model.clock.attach_alarm(cpl)
        saved = model.end_alarm
        model.end_alarm = cpl
        try:
            ocn_run(model)
        finally:
            model.end_alarm = saved
            model.clock.alarms.remove(cpl)
        return self.exports()

    def exports(self) -> Dict[str, np.ndarray]:
        model = self.model
        mesh = model.mesh
        h = np.asarray(model.state.h)
        depth = np.asarray(mesh.bottom_depth)
        out = {"ssh": h.sum(axis=1) - depth}
        tr = np.asarray(model.state.tracers)
        if self._temp_idx is not None:
            out["sst"] = tr[self._temp_idx][:, 0]
        if self._salt_idx is not None:
            out["sss"] = tr[self._salt_idx][:, 0]
        uz, vm = reconstruct_cell_velocity(mesh, model.state.u)
        out["u_zonal"] = np.asarray(uz)[:, 0]
        out["v_merid"] = np.asarray(vm)[:, 0]
        return out

    def finalize(self):
        from omega_tpu.driver import ocn_finalize
        return ocn_finalize(self.model)

    @property
    def clock_time(self) -> str:
        return str(self.model.clock.get_current_time())
