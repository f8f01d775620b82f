"""Sharded training step: data (+ optional spatial) parallelism.

Replaces the whole P2PSync machinery (parallel.cpp:152-437): instead of a
per-iteration parameter broadcast and gradient tree-reduction over device
memcpys, the train step is jit-compiled with sharding annotations — batch
split over the ``data`` axis, params replicated — and XLA emits the psum
over ICI inside the program. Per-GPU solver threads, blocking-queue
handshakes, and the DevicePair reduction tree have no equivalent: SPMD
compilation subsumes them.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh (the initial 'broadcast')."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_sharding(mesh: Mesh, *, spatial: bool = True) -> NamedSharding:
    """(N, H, W, C) arrays: batch over 'data', H over 'spatial'."""
    if spatial and mesh.shape.get("spatial", 1) > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Any, mesh: Mesh, *, spatial: bool = True) -> Any:
    """Place a host batch (dict of (N,H,W,C) numpy arrays) onto the mesh.

    Single-process: device_put with a NamedSharding. Multi-host processes
    each hold a slice of the global batch and should use
    jax.make_array_from_process_local_data (same sharding), which this
    falls through to when jax.process_count() > 1.
    """
    sharding = batch_sharding(mesh, spatial=spatial)
    if jax.process_count() > 1:  # pragma: no cover - needs multi-host
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_parallel_train_step(
    train_step: Callable,
    mesh: Mesh,
    *,
    spatial: bool = True,
) -> Callable:
    """Compile a TrainState step function for the mesh.

    ``train_step(state, batch) -> (state, loss, aux)`` — the output of
    flownet2_tpu.train.solver.make_train_step (unjitted). Params/opt state
    are replicated; batches are sharded over (data[, spatial]); XLA inserts
    the gradient all-reduce.
    """
    repl = NamedSharding(mesh, P())
    bsh = batch_sharding(mesh, spatial=spatial)

    return jax.jit(
        train_step,
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl, repl),
        donate_argnums=0,
    )
