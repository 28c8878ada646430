from omega_tpu.core.config import (ModelConfig, TendencyConfig,
                                   ManufacturedConfig, VertMixConfig,
                                   model_config_from_yaml)
from omega_tpu.core.state import ModelState, init_state
from omega_tpu.core import aux, tendencies, eos, vert_coord, vmix
from omega_tpu.core.tracers import (TracerSet, select_tracers,
                                    register_tracer_fields, TRACER_CATALOG)
from omega_tpu.core.eos import EosConfig, compute_spec_vol, teos10_specvol
