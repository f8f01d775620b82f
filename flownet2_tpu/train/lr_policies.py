"""Learning-rate policies with Caffe-exact semantics.

Reference: SolverParameter (caffe.proto:159-174) and
SGDSolver::GetLearningRate (src/caffe/solvers/sgd_solver.cpp):

  fixed:     base_lr
  step:      base_lr * gamma^floor(iter/stepsize)
  exp:       base_lr * gamma^iter
  inv:       base_lr * (1 + gamma*iter)^(-power)
  multistep: base_lr * gamma^(#stepvalues passed)
  poly:      base_lr * (1 - iter/max_iter)^power
  sigmoid:   base_lr * 1/(1 + exp(-gamma*(iter - stepsize)))

Each policy returns an ``optax``-style schedule fn: iteration -> lr (works
with traced iteration counts inside a jitted step).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def lr_policy(
    policy: str,
    base_lr: float,
    *,
    gamma: float = 0.1,
    stepsize: int = 100000,
    power: float = 1.0,
    max_iter: int = 0,
    stepvalues: Sequence[int] = (),
) -> Schedule:
    if policy == "fixed":
        return lambda it: jnp.asarray(base_lr, jnp.float32)
    if policy == "step":
        return lambda it: base_lr * gamma ** jnp.floor(it / stepsize)
    if policy == "exp":
        return lambda it: base_lr * gamma ** jnp.asarray(it, jnp.float32)
    if policy == "inv":
        return lambda it: base_lr * (1.0 + gamma * jnp.asarray(it, jnp.float32)) ** (-power)
    if policy == "multistep":
        steps = jnp.asarray(list(stepvalues), jnp.int32)

        def sched(it):
            current_step = jnp.sum(jnp.asarray(it, jnp.int32) >= steps)
            return base_lr * gamma ** current_step.astype(jnp.float32)

        return sched
    if policy == "poly":
        if max_iter <= 0:
            raise ValueError("poly policy requires max_iter")
        return lambda it: base_lr * (1.0 - jnp.asarray(it, jnp.float32) / max_iter) ** power
    if policy == "sigmoid":
        return lambda it: base_lr / (
            1.0 + jnp.exp(-gamma * (jnp.asarray(it, jnp.float32) - stepsize))
        )
    raise ValueError(f"unknown lr_policy {policy!r}")


# The FlowNet2 training schedules (README.md:100-106 names the datasets; the
# S_long / S_fine / S_short solver prototxts ship with the downloaded model
# tarballs — schedule shapes per the FlowNet 2.0 paper, §4).
FLOWNET_SCHEDULES = {
    # 1.2M iters on FlyingChairs from scratch; lr 1e-4 halved at 400k/600k/800k/1M.
    "S_long": dict(
        policy="multistep",
        base_lr=1e-4,
        gamma=0.5,
        stepvalues=(400_000, 600_000, 800_000, 1_000_000),
        max_iter=1_200_000,
    ),
    # 500k fine-tune iters (FlyingThings3D); lr 1e-5 halved at 200k/300k/400k.
    "S_fine": dict(
        policy="multistep",
        base_lr=1e-5,
        gamma=0.5,
        stepvalues=(200_000, 300_000, 400_000),
        max_iter=500_000,
    ),
    # 600k iters; lr 1e-4 halved at 300k/400k/500k.
    "S_short": dict(
        policy="multistep",
        base_lr=1e-4,
        gamma=0.5,
        stepvalues=(300_000, 400_000, 500_000),
        max_iter=600_000,
    ),
}


def flownet_schedule(name: str) -> tuple[Schedule, int]:
    cfg = dict(FLOWNET_SCHEDULES[name])
    max_iter = cfg.pop("max_iter")
    return lr_policy(**cfg), max_iter
