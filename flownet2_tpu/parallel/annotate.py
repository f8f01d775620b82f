"""Activation sharding annotations for SPMD compilation.

Without hints, XLA's sharding propagation has to guess a layout for every
intermediate; on the FlowNet decoders it guesses a spatial sharding for
/64-scale activations whose H is SMALLER than the spatial mesh axis (e.g.
an (N, 1, 2, 1024) conv6_1 tensor on a spatial=2 mesh) and then falls back
to "Involuntary full rematerialization" — replicate-then-repartition — to
reconcile producers and consumers (spmd_partitioner.cc warning; seen on the
round-1 multichip dryrun, MULTICHIP_r01.json).

The fix is declarative, matching the scaling-book recipe: models run inside
an :func:`activation_sharding` context carrying the mesh, and every
activation passes through :func:`constrain_act`, which pins NHWC tensors to
``P('data', 'spatial')`` when H divides the spatial axis and to
``P('data')`` (spatial-replicated) otherwise. Deep coarse scales are tiny,
so replicating them costs nothing while removing the degenerate reshards.

Outside a mesh context (single-chip inference, CPU tests) everything here
is an exact no-op, so model code can call :func:`constrain_act`
unconditionally.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: ContextVar[Optional[Mesh]] = ContextVar("flownet2_tpu_act_mesh", default=None)


@contextmanager
def activation_sharding(mesh: Optional[Mesh]):
    """Enable activation sharding constraints for code traced inside.

    Used by :func:`~flownet2_tpu.parallel.data_parallel.make_parallel_train_step`
    around the train step body; tracing happens while the context is live, so
    the constraints are baked into the jaxpr.
    """
    token = _ACTIVE_MESH.set(mesh)
    try:
        yield
    finally:
        _ACTIVE_MESH.reset(token)


def current_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH.get()


# Minimum rows per spatial shard. Below this, a tensor is so small that
# replicating it is free while sharding it drags its producers/consumers
# (deconvs with lhs dilation, halo exchanges) into degenerate partitionings —
# the exact ops the SPMD partitioner "involuntarily rematerializes".
MIN_ROWS_PER_SHARD = 8


def constrain_act(x):
    """Pin an (N, H, W, C) activation's sharding to the active mesh.

    Batch over ``data`` (when it divides); H over ``spatial`` only when H
    divides the spatial axis AND each shard keeps >= MIN_ROWS_PER_SHARD
    rows — coarse decoder scales replicate over spatial instead of forcing
    the SPMD partitioner's full-rematerialization fallback. No-op outside
    an :func:`activation_sharding` context or for non-NHWC ranks.
    """
    mesh = _ACTIVE_MESH.get()
    if mesh is None or getattr(x, "ndim", 0) != 4:
        return x
    data = mesh.shape.get("data", 1)
    spatial = mesh.shape.get("spatial", 1)
    if data <= 1 and spatial <= 1:
        return x
    h = x.shape[1]
    spec_n = "data" if data > 1 and x.shape[0] % data == 0 else None
    spec_h = (
        "spatial"
        if spatial > 1 and h % spatial == 0 and h // spatial >= MIN_ROWS_PER_SHARD
        else None
    )
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(spec_n, spec_h)))
