"""Training stack: the reference Solver subsystem rebuilt on optax/orbax.

- ``lr_policies`` — the 7 Caffe LR policies + FlowNet schedule presets.
- ``solvers``     — SGD/Nesterov/AdaGrad/RMSProp/AdaDelta/Adam update rules
                    with Caffe-matching semantics (lr inside the momentum
                    accumulator).
- ``solver``      — the train loop: iter_size accumulation, smoothed loss,
                    snapshot/restore (orbax), signal-driven actions.
"""

from flownet2_tpu.train.lr_policies import lr_policy, FLOWNET_SCHEDULES
from flownet2_tpu.train.solvers import make_solver, SolverConfig
from flownet2_tpu.train.solver import Solver, TrainState

__all__ = [
    "lr_policy",
    "FLOWNET_SCHEDULES",
    "make_solver",
    "SolverConfig",
    "Solver",
    "TrainState",
]
