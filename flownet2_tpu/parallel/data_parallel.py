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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh (the initial 'broadcast').

    Donation-safe: when a leaf is already a committed ``jax.Array``,
    ``device_put`` may ALIAS its buffer (observed on the CPU backend) — a
    train step that donates the replicated state would then delete the
    caller's original arrays out from under it. Leaves that are already
    device arrays are copied first. replicate() runs at init/restore time
    only, so the extra copy is never on the hot path.
    """
    sharding = NamedSharding(mesh, P())

    def put(x):
        if isinstance(x, jax.Array):
            x = jnp.array(x, copy=True)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh, *, spatial: bool = True, ndim: int = 4) -> NamedSharding:
    """Sharding for one batch leaf: batch dim over 'data'; H (dim 1) over
    'spatial' for image-shaped (rank>=3) leaves. Small per-item coefficient
    arrays — e.g. the (N, 6) augmentation affines — stay data-sharded only."""
    if ndim >= 3 and spatial and mesh.shape.get("spatial", 1) > 1:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


# Batch keys that carry REPLICATED state rather than per-item data — the
# MeanRecompute running mean (H, W, C) and its scalar counter, and the
# "frozen" upstream-params subtree of a split stage loss (objectives.
# make_split_stage_loss), ride the batch dict but must be whole on every
# device (row-slicing a mean image or a conv kernel would corrupt loss_fn).
# "frozen" marks a SUBTREE: every leaf under it replicates.
REPLICATED_BATCH_KEYS = frozenset(
    {"mean_image0", "mean_image1", "mean_iter", "frozen"}
)


def batch_partition_specs(batch: Any, *, spatial: bool = False) -> Any:
    """PartitionSpec pytree for a host batch: per-item leaves (leading dim ==
    the batch size, taken from ``img0``) shard over 'data' (+H over 'spatial'
    for rank>=3 when requested); replicated-state leaves (known keys, scalars,
    or leaves whose dim 0 isn't the batch size) get P()."""
    n = None
    if isinstance(batch, dict) and "img0" in batch:
        n = np.shape(batch["img0"])[0]

    def spec(path, x):
        ndim = np.ndim(x)
        keys = {p.key for p in path if hasattr(p, "key")}
        if keys & REPLICATED_BATCH_KEYS or ndim == 0:
            return P()
        if n is not None and np.shape(x)[0] != n:
            return P()
        if ndim >= 3 and spatial:
            return P("data", "spatial")
        return P("data")

    return jax.tree_util.tree_map_with_path(spec, batch)


def shard_batch(batch: Any, mesh: Mesh, *, spatial: bool = True) -> Any:
    """Place a host batch (pytree of (N, ...) numpy arrays) onto the mesh.

    Single-process: device_put with a NamedSharding. Multi-host processes
    each hold a slice of the global batch and should use
    jax.make_array_from_process_local_data (same sharding), which this
    falls through to when jax.process_count() > 1.
    """
    use_spatial = spatial and mesh.shape.get("spatial", 1) > 1
    specs = batch_partition_specs(batch, spatial=use_spatial)

    # covered by tests/test_multiprocess.py (2-process gloo cluster), which
    # runs this branch in worker subprocesses — invisible to in-process
    # coverage, hence the pragma stays.
    if jax.process_count() > 1:  # pragma: no cover - runs in subprocesses
        return jax.tree.map(
            lambda x, s: jax.make_array_from_process_local_data(
                NamedSharding(mesh, s), np.asarray(x)
            ),
            batch,
            specs,
        )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs
    )


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
    the gradient all-reduce. The step body runs under
    :func:`~flownet2_tpu.parallel.annotate.activation_sharding`, so model
    activations carry explicit layout constraints (no SPMD guessing on the
    coarse decoder scales).
    """
    from flownet2_tpu.parallel.annotate import activation_sharding

    repl = NamedSharding(mesh, P())

    use_spatial = spatial and mesh.shape.get("spatial", 1) > 1

    def wrapped(state, batch):
        state = jax.lax.with_sharding_constraint(state, repl)
        specs = batch_partition_specs(batch, spatial=use_spatial)
        batch = jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s)),
            batch,
            specs,
        )
        with activation_sharding(mesh):
            return train_step(state, batch)

    return jax.jit(wrapped, out_shardings=(repl, repl, repl), donate_argnums=0)


def make_dp_train_step(loss_fn, tx, mesh: Mesh) -> Callable:
    """Pure data-parallel train step with ONE fused gradient all-reduce.

    GSPMD inserts one psum per parameter gradient (~175 for the FlowNet2
    cascade); on backends without an all-reduce combiner every one of those
    is a separate collective rendezvous. This builder is the reference's
    ``GPUParams`` design reborn (parallel.cpp:26-56 flattens ALL learnables
    into one contiguous buffer so P2PSync reduces a single span): inside
    ``shard_map`` each device computes gradients on its batch shard, the
    gradient pytree is raveled into one flat vector, a SINGLE
    ``lax.psum`` crosses the mesh, and the optimizer update runs on the
    replicated result. Batch-only sharding (no spatial axis: each device
    holds whole images, so no conv halos are needed and the body is
    embarrassingly parallel up to the one collective).

    ``loss_fn(params, batch) -> (scalar_loss, aux_dict)``; aux entries are
    pmean'd across devices. Returns ``step(state, batch) -> (state, loss,
    aux)`` jitted for the mesh, equivalent to the unsharded step up to
    mean-of-means == global-mean (equal shard sizes).
    """
    from jax.flatten_util import ravel_pytree

    import optax

    repl = NamedSharding(mesh, P())
    # batch shards vary over 'data' only; any other mesh axes see replicas
    # (pure-DP contract), so the collective crosses just the data axis.
    axes = ("data",)
    n_dev = mesh.shape["data"]

    # Autodiff subtlety that makes check_vma=False essential: with varying-
    # mode checking ON, the transpose of replicated→varying dataflow inserts
    # a psum at every point replicated params enter the varying computation —
    # differentiating wrt the params PYTREE emits one collective PER
    # PARAMETER (the very storm this builder removes). With checking OFF,
    # grad() returns each device's PARTIAL gradients with no collectives;
    # raveling that gradient pytree and crossing the mesh with ONE explicit
    # psum restores the mean. (An earlier formulation kept checking on and
    # differentiated through unravel(flat_params) so the pcast transpose was
    # the one psum — but the transpose of each leaf's slice-of-flat is a PAD
    # to the full flat length, so the flat cotangent was assembled by ~n_leaf
    # full-size padded adds: ~175 × 150 MB of traffic per step for a FlowNet
    # stage. Grads wrt the pytree give leaf cotangents directly; the only
    # full-size ops left are one concat + one psum + the slices back out.)
    def local_grads(params, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        gflat, g_unravel = ravel_pytree(grads)
        gflat = jax.lax.psum(gflat, axes) / n_dev  # THE one collective
        # bundle the scalar stats into one small collective too
        aux_flat, aux_unravel = ravel_pytree(aux)
        stats = jnp.concatenate([loss[None].astype(jnp.float32), aux_flat])
        stats = jax.lax.psum(stats, axes) / n_dev
        return g_unravel(gflat), stats[0], aux_unravel(stats[1:])

    def step(state, batch):
        batch_specs = batch_partition_specs(batch, spatial=False)
        grads, loss, aux = jax.shard_map(
            local_grads,
            mesh=mesh,
            in_specs=(P(), batch_specs),
            out_specs=P(),
            check_vma=False,
        )(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, iteration=state.iteration + 1
        )
        return new_state, loss, aux

    return jax.jit(step, out_shardings=(repl, repl, repl), donate_argnums=0)
