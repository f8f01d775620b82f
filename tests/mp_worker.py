"""Worker process for the multi-host data-parallel test.

Launched (not imported) by tests/test_multiprocess.py: one JAX process in
an N-process gloo cluster on localhost, each process owning 4 virtual CPU
devices. Exercises the jax.process_count() > 1 branch of
parallel.data_parallel.shard_batch (make_array_from_process_local_data)
that a single-process suite can never reach — the reference's analogue is
that multi-GPU P2PSync is only testable with >=2 physical GPUs
(test_gradient_based_solver.cpp:196-207); we get there with >=2 processes
on one host instead.

Usage: python mp_worker.py <proc_id> <num_procs> <coordinator_port> <outdir>
Writes <outdir>/result_<proc_id>.npz with the step's loss and updated w.
"""

import os
import sys


def main() -> None:
    proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )

    import jax.numpy as jnp
    import numpy as np

    from flownet2_tpu.parallel import (
        MeshConfig,
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from flownet2_tpu.train import SolverConfig, TrainState
    from flownet2_tpu.train.solvers import make_solver

    n_global = 4 * num_procs
    assert jax.device_count() == n_global, (
        f"expected {n_global} global devices, got {jax.device_count()}"
    )
    assert jax.local_device_count() == 4

    mesh = make_mesh(MeshConfig(data=n_global, spatial=1))

    def toy_loss(params, batch):
        pred = batch["x"] @ params["w"]
        loss = jnp.mean(jnp.square(pred - batch["y"]))
        return loss, {"loss": loss}

    cfg = SolverConfig(solver_type="sgd", base_lr=0.1, momentum=0.9)
    tx = make_solver(cfg)
    params = {
        "w": jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 2)), jnp.float32
        )
    }

    # The GLOBAL batch is seeded identically in every process and in the
    # single-process reference; each process slices out its local rows.
    rng = np.random.default_rng(1)
    global_batch = {
        "x": rng.standard_normal((n_global, 4)).astype(np.float32),
        "y": rng.standard_normal((n_global, 2)).astype(np.float32),
    }
    lo, hi = 4 * proc_id, 4 * (proc_id + 1)
    local_batch = {k: v[lo:hi] for k, v in global_batch.items()}

    # shard_batch takes the PROCESS-LOCAL slice when process_count() > 1
    sharded = shard_batch(local_batch, mesh, spatial=False)
    for leaf in jax.tree.leaves(sharded):
        assert leaf.shape[0] == n_global, "global shape must span processes"

    step = make_dp_train_step(toy_loss, tx, mesh)
    state = TrainState(params, tx.init(params), jnp.zeros([], jnp.int32))
    state = replicate(state, mesh)
    state, loss, _aux = step(state, sharded)
    jax.block_until_ready(loss)

    np.savez(
        os.path.join(outdir, f"result_{proc_id}.npz"),
        loss=np.asarray(loss),
        w=np.asarray(state.params["w"]),
    )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
