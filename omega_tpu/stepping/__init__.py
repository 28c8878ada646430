from omega_tpu.stepping.steppers import (
    forward_backward_step,
    rk2_step,
    rk4_step,
    make_stepper,
    run_steps,
)
from omega_tpu.stepping.split import (
    split_forward_backward_step,
    make_split_stepper,
)
