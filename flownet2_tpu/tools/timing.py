"""Trustworthy device timing primitives.

Methodology (docs/DESIGN_NOTES.md "Remote-TPU measurement methodology"):
on a tunneled TPU, ``jax.block_until_ready`` does not actually block and
repeated identical dispatches get deduplicated, so naive timing loops
report through a fantasy path. Every measurement here:

1. runs N data-dependent iterations inside ONE jitted ``fori_loop`` (each
   iteration's input depends on the previous output, so nothing dedups);
2. forces completion with a scalar host fetch;
3. differences the wall times of two N values to cancel the fixed
   dispatch/round-trip overhead.

This is the framework's ``caffe time`` measurement core
(tools/caffe.cpp:302-388 replaced by whole-program + per-stage A/B timing,
since XLA fuses layers — see cli/time_cmd.py).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax


def chain_ms(
    op: Callable,
    feedback_arg,
    rest_args: Sequence,
    n1: int,
    n2: int,
    *,
    repeats: int = 2,
) -> float:
    """ms/iteration of ``op(feedback_arg, *rest_args)`` with data-dependent
    chaining (the output feeds an epsilon back into the first argument).

    ``rest_args`` are passed as jit ARGUMENTS, never closed over: closing
    over large params bakes them into the HLO as constants and overflows
    the remote compile service (DESIGN_NOTES).
    """

    @jax.jit
    def run(a0, rest, n):
        def body(i, carry):
            a0, acc = carry
            out = op(a0, *rest)
            s = sum(jnp.sum(x).astype(jnp.float32) for x in jax.tree.leaves(out))
            acc = acc + s
            a0 = a0 + (acc * 1e-30).astype(a0.dtype)
            return (a0, acc)

        _, acc = lax.fori_loop(0, n, body, (a0, jnp.float32(0)))
        return acc

    rest_args = tuple(rest_args)

    def timed(n):
        t0 = time.perf_counter()
        float(run(feedback_arg, rest_args, n))
        return time.perf_counter() - t0

    timed(n1)  # compile + warm
    t1 = min(timed(n1) for _ in range(repeats))
    t2 = min(timed(n2) for _ in range(repeats))
    return (t2 - t1) / (n2 - n1) * 1000
