"""Flagship global-configuration integration test.

One run exercising the full stack together the way a production user
would: generated spherical mesh, TEOS-10 EOS diagnostics, FCT monotone
tracers, implicit vertical mixing, wind forcing, alarmed
history + diagnostics streams — all through the config-driven driver.
"""

import os

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
import yaml

from omega_tpu.driver import ocn_finalize, ocn_init, ocn_run
from omega_tpu.io.netcdf import read_netcdf


def test_global_flagship(tmp_path):
    tmp = str(tmp_path)
    doc = {"Omega": {
        "TimeIntegration": {
            "CalendarType": "No Leap", "TimeStepper": "Forward-Backward",  # FCT needs the FB thickness-first order
            "TimeStep": "0000_00:02:00", "StartTime": "0001-01-01_00:00:00",
            "StopTime": "0001-01-01_00:40:00", "RunDuration": "none"},
        "Mesh": {"Generate": {"Kind": "sphere", "Subdivisions": 8,
                              "BottomDepth": 4000.0}},
        "VertCoord": {"NVertLayers": 6},
        "VertMix": {"Enabled": True, "KappaTracer": 1.0e-4,
                    "KappaMomentum": 1.0e-3},
        "Eos": {"EosType": "teos10"},
        "Advection": {"FluxThicknessType": "Center",
                      "FluxTracerType": "FCT"},
        "WindStress": {"InterpType": "Isotropic", "ConstantZonal": 0.05},
        "Tracers": {"Base": ["Temperature", "Salinity"],
                    "Debug": ["Debug1"]},
        "Tendencies": {
            "WindForcingTendencyEnable": True,
            "BottomDragTendencyEnable": True, "BottomDragCoeff": 1.0e-3,
            "VelDiffTendencyEnable": True, "ViscDel2": 1.0e3,
            "VelHyperDiffTendencyEnable": False,
            "TracerDiffTendencyEnable": False,
            "TracerHyperDiffTendencyEnable": False},
        "IOStreams": {
            "History": {"Filename": "ocn.hist.$SimTime", "Mode": "write",
                        "IfExists": "replace", "Freq": 20,
                        "FreqUnits": "minutes",
                        "Contents": ["State", "Tracers", "SshCell"]},
            "Diag": {"Filename": "ocn.diag.$SimTime", "Mode": "write",
                     "IfExists": "replace", "Freq": 40,
                     "FreqUnits": "minutes",
                     "Contents": ["Diagnostics"]},
        }}}
    p = os.path.join(tmp, "omega.yml")
    with open(p, "w") as f:
        yaml.safe_dump(doc, f)

    model = ocn_init(config_file=p, directory=tmp)
    assert model.tracers.ntracers == 3
    assert model.model_cfg.flux_tracer_type == "fct"
    assert model.model_cfg.vert_mix.enabled

    # stratified T/S + step-function debug tracer
    mesh = model.mesh
    K = 6
    lat = np.asarray(mesh.lat_cell)
    tprof = np.linspace(25.0, 2.0, K)[None, :] * np.ones((mesh.ncells, 1))
    sprof = 35.0 * np.ones((mesh.ncells, K))
    dbg = np.where(lat > 0, 1.0, 0.0)[:, None] * np.ones((1, K))
    model.state = model.state._replace(
        tracers=jnp.asarray(np.stack([tprof, sprof, dbg])))

    area = np.asarray(mesh.area_cell)[:, None]
    vol0 = np.sum(area * np.asarray(model.state.h))
    heat0 = np.sum(area * np.asarray(model.state.h) * tprof)

    model = ocn_run(model)
    state = ocn_finalize(model)

    # conservation (volume exact; heat to roundoff through FCT + vmix)
    vol1 = np.sum(area * np.asarray(state.h))
    heat1 = np.sum(area * np.asarray(state.h)
                   * np.asarray(state.tracers[0]))
    assert abs(vol1 - vol0) / vol0 < 1e-13
    assert abs(heat1 - heat0) / abs(heat0) < 1e-11

    # monotone debug tracer stays in [0, 1]
    dbg1 = np.asarray(state.tracers[2])
    assert dbg1.min() > -1e-9 and dbg1.max() < 1.0 + 1e-9

    # wind spun up a surface current, drag/mixing kept it bounded
    u = np.asarray(state.u)
    assert 0 < np.abs(u[:, 0]).max() < 1.0

    # streams landed with the right contents
    hist = [f for f in os.listdir(tmp) if f.startswith("ocn.hist.")]
    diag = [f for f in os.listdir(tmp) if f.startswith("ocn.diag.")]
    assert len(hist) == 2 and len(diag) == 1
    nc = read_netcdf(os.path.join(tmp, diag[0]))
    rho = 1.0 / nc.get("SpecVol")
    assert 1020 < rho.mean() < 1045      # TEOS-10 in ocean range
    assert nc.get("PressureMid").max() > 3e7   # ~4000 m column
