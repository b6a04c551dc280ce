from py_psnode_tpu.solvers.steppers import Euler, Midpoint, RK4, get_stepper  # noqa: F401
from py_psnode_tpu.solvers.events import event_match, jumped_stream  # noqa: F401
from py_psnode_tpu.solvers.integrate import (  # noqa: F401
    integrate_ode,
    integrate_dae,
    time_grid_from_step_size,
)
from py_psnode_tpu.solvers.interp import cubic_hermite_interp, linear_interp  # noqa: F401
