from omega_tpu.infra.time_manager import (
    Calendar,
    CalendarKind,
    TimeInstant,
    TimeInterval,
    TimeUnits,
    Alarm,
    Clock,
)
from omega_tpu.infra.logging import get_logger, init_logging
from omega_tpu.infra.timers import Timers, timer
from omega_tpu.infra.errors import OmegaError, abort_error
