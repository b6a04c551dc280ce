"""py_psnode_tpu — TPU-native neural ODE/DAE framework for power-system
dynamic component modeling.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of xxh0523/Py_PSNODE
(reference layout: neural_dae/my_solvers.py, neural_dae/my_fixed_grid.py,
neural_dae/neural_base.py plus four training drivers). Components are modeled
as neural ODEs (differential states ``x`` driven by exogenous inputs ``z``) or
semi-explicit neural DAEs (adds algebraic input ``v`` and algebraic output
``i``), integrated on a fixed time grid with explicit steppers and trained by
backprop through the unrolled solve.

Design stance (TPU-first, not a port):
  * time loops are ``jax.lax.scan``, not Python loops
  * disturbance events are branchless data (precomputed jumped input streams)
  * trajectory batches ride ``vmap``/batch axes, sharded over a device mesh
  * memory over long horizons via ``jax.checkpoint`` rematerialization
  * hot per-step MLPs have algebraic lift-out of scan-invariant work and an
    optional Pallas fused kernel
"""

__version__ = "0.1.0"

from py_psnode_tpu.solvers import (  # noqa: F401
    Euler,
    Midpoint,
    RK4,
    get_stepper,
    integrate_ode,
    integrate_dae,
)
from py_psnode_tpu.data import (  # noqa: F401
    OdeSamples,
    DaeSamples,
)
from py_psnode_tpu.models import (  # noqa: F401
    ODEModel,
    ODEEncodeModel,
    DAEModel,
    DAEEncodeModel,
)
