"""The six reference solver update rules as optax gradient transforms.

Reference: src/caffe/solvers/{sgd,nesterov,adagrad,rmsprop,adadelta,adam}_
solver.cpp (+ .cu update kernels). Semantics notes:

- Caffe folds the learning rate INTO the momentum accumulator
  (v = m*v + lr*(g + wd*w); w -= v), unlike optax.sgd which scales after the
  trace. The chains below order [weight-decay → lr → trace] to reproduce
  Caffe exactly under time-varying LR.
- weight decay is plain L2 on all learnable params (Caffe decay_mult default).
- Each solver's CUDA update kernel collapses to an optax transform — the
  per-rule .cu files have no TPU analogue because XLA fuses the update into
  the step program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

import jax.numpy as jnp
import optax

from flownet2_tpu.train.lr_policies import Schedule, lr_policy


@dataclass(frozen=True)
class SolverConfig:
    """The SolverParameter subset that affects optimization
    (caffe.proto:104-244)."""

    solver_type: str = "sgd"  # sgd|nesterov|adagrad|rmsprop|adadelta|adam
    base_lr: float = 1e-4
    lr_policy: str = "fixed"
    gamma: float = 0.1
    stepsize: int = 100_000
    power: float = 1.0
    stepvalues: Sequence[int] = ()
    max_iter: int = 1_200_000
    momentum: float = 0.9
    momentum2: float = 0.999  # Adam beta2
    weight_decay: float = 0.0
    delta: float = 1e-8  # AdaGrad/RMSProp/AdaDelta/Adam epsilon
    rms_decay: float = 0.99
    iter_size: int = 1
    clip_gradients: float = -1.0  # L2-norm clip threshold; <0 disables

    def schedule(self) -> Schedule:
        return lr_policy(
            self.lr_policy,
            self.base_lr,
            gamma=self.gamma,
            stepsize=self.stepsize,
            power=self.power,
            max_iter=self.max_iter,
            stepvalues=self.stepvalues,
        )


def make_solver(config: SolverConfig) -> optax.GradientTransformation:
    """Build the optax chain for a solver config. Updates are NEGATIVE deltas
    (optax convention: params + updates)."""
    sched = config.schedule()
    parts: list[optax.GradientTransformation] = []

    if config.clip_gradients > 0:
        # Caffe SGDSolver::ClipGradients: scale all grads if global L2 norm
        # exceeds the threshold (sgd_solver.cpp).
        parts.append(optax.clip_by_global_norm(config.clip_gradients))

    if config.weight_decay > 0:
        parts.append(optax.add_decayed_weights(config.weight_decay))

    t = config.solver_type.lower()
    if t == "sgd":
        parts += [
            optax.scale_by_schedule(sched),
            optax.trace(decay=config.momentum),
        ]
    elif t == "nesterov":
        parts += [
            optax.scale_by_schedule(sched),
            optax.trace(decay=config.momentum, nesterov=True),
        ]
    elif t == "adagrad":
        parts += [
            optax.scale_by_rss(initial_accumulator_value=0.0, eps=config.delta),
            optax.scale_by_schedule(sched),
        ]
    elif t == "rmsprop":
        parts += [
            optax.scale_by_rms(decay=config.rms_decay, eps=config.delta),
            optax.scale_by_schedule(sched),
        ]
    elif t == "adadelta":
        parts += [
            optax.scale_by_adadelta(rho=config.momentum, eps=config.delta),
            optax.scale_by_schedule(sched),
        ]
    elif t == "adam":
        parts += [
            optax.scale_by_adam(
                b1=config.momentum, b2=config.momentum2, eps=config.delta
            ),
            optax.scale_by_schedule(sched),
        ]
    else:
        raise ValueError(f"unknown solver_type {config.solver_type!r}")

    parts.append(optax.scale(-1.0))
    return optax.chain(*parts)
