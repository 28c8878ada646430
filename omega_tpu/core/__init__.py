from omega_tpu.core.config import ModelConfig, TendencyConfig, ManufacturedConfig
from omega_tpu.core.state import ModelState, init_state
from omega_tpu.core import aux, tendencies
