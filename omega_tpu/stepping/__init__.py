from omega_tpu.stepping.steppers import (
    forward_backward_step,
    rk2_step,
    rk4_step,
    make_stepper,
    run_steps,
)
