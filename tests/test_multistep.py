"""K-step dispatch surface: make_multistep_train_step, CacheChunks,
Solver.solve_cached (train/solver.py, data/device_cache.py).

The multi-step path exists so a high-latency host link is touched once per
K iterations instead of ~10 times per step; its contract is that the
TRAINING MATH is unchanged — K steps inside one jitted lax.scan must match
K sequential single-step dispatches on the same data (the reference's
per-iteration ApplyUpdate semantics, solver.cpp:222+), with display/test/
snapshot honored at chunk boundaries.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.data.device_cache import (
    CacheChunks,
    DeviceSampleCache,
    cycle_dataset,
    make_cache_gather_loss,
)
from flownet2_tpu.train.solver import (
    Solver,
    TrainState,
    make_multistep_train_step,
    make_train_step,
)
from flownet2_tpu.train.solvers import SolverConfig, make_solver


def _toy_loss(params, batch):
    pred = batch["x"] @ params["w"]  # (b, d) @ (d,) -> (b,)
    return jnp.mean((pred - batch["coef"]) ** 2), {}


def _toy_setup(k=4, batch=3, dim=5, n_slabs=2, slab=6, seed=0):
    rng = np.random.default_rng(seed)
    slabs = tuple(
        {"x": jnp.asarray(rng.normal(size=(slab, dim)).astype(np.float32))}
        for _ in range(n_slabs)
    )
    bank = {
        "cache_idx": rng.integers(0, n_slabs * slab, size=(k, batch)).astype(np.int32),
        "coef": rng.normal(size=(k, batch)).astype(np.float32),
    }
    params = {"w": jnp.asarray(rng.normal(size=(dim,)).astype(np.float32))}
    return slabs, bank, params


@pytest.mark.parametrize("solver_type", ["sgd", "adam"])
def test_multistep_matches_k_single_steps(solver_type):
    """K steps per dispatch == K sequential single-step dispatches, on the
    same slabs/bank — params and all K losses."""
    k = 4
    slabs, bank, params = _toy_setup(k=k)
    tx = make_solver(SolverConfig(solver_type=solver_type, base_lr=1e-2, max_iter=100))
    loss_fn = make_cache_gather_loss(_toy_loss)

    def fresh_state():
        # the multistep runner donates its state argument: each path needs
        # its own buffer copies
        p = jax.tree.map(jnp.array, params)
        return TrainState(params=p, opt_state=tx.init(p), iteration=jnp.zeros([], jnp.int32))

    run = make_multistep_train_step(loss_fn, tx)
    multi_state, multi_losses = run(
        fresh_state(), slabs, {n: jnp.asarray(v) for n, v in bank.items()}
    )

    step = jax.jit(make_train_step(loss_fn, tx))
    state2 = fresh_state()
    merged = jnp.concatenate([s["x"] for s in slabs], axis=0)
    single_losses = []
    for i in range(k):
        batch = {"cache_x": merged, "cache_idx": bank["cache_idx"][i], "coef": bank["coef"][i]}
        state2, loss, _ = step(state2, batch)
        single_losses.append(float(loss))

    np.testing.assert_allclose(
        np.asarray(multi_losses), np.asarray(single_losses), rtol=1e-6, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(multi_state.params["w"]), np.asarray(state2.params["w"]),
        rtol=1e-6, atol=1e-7,
    )
    assert int(multi_state.iteration) == k


def test_cache_chunks_bank_semantics(tmp_path):
    """CacheChunks yields (slabs, bank): slab tuple snapshot, (K, batch)
    index bank addressing the slab CONCATENATION, aug arrays reshaped to a
    leading (K, batch)."""
    rng = np.random.default_rng(1)
    samples = [{"x": rng.normal(size=(4,)).astype(np.float32)} for _ in range(10)]

    def it():
        i = 0
        while True:
            yield samples[i % len(samples)]
            i += 1

    cache = DeviceSampleCache(it(), slab_samples=3, n_slabs=2, refresh=False)
    try:
        def aug_sampler(rng_, n):
            return {"aug_a": rng_.normal(size=(n,)).astype(np.float32),
                    "aug_m": rng_.normal(size=(n, 6)).astype(np.float32)}

        chunks = CacheChunks(cache, batch_size=2, steps_per_dispatch=5,
                             seed=0, aug_sampler=aug_sampler)
        slabs, bank = next(iter(chunks))
        assert isinstance(slabs, tuple) and len(slabs) == 2
        assert bank["cache_idx"].shape == (5, 2)
        assert bank["cache_idx"].dtype == np.int32
        total = 2 * 3  # n_slabs * slab_samples: indices address the concat
        assert bank["cache_idx"].min() >= 0 and bank["cache_idx"].max() < total
        assert bank["aug_a"].shape == (5, 2)
        assert bank["aug_m"].shape == (5, 2, 6)
    finally:
        cache.stop()

    with pytest.raises(ValueError):
        CacheChunks(cache, 2, 0)


def _chunk_stream(slabs, k, batch, seed=0):
    """Deterministic (slabs, bank) stream with the CacheChunks layout."""
    rng = np.random.default_rng(seed)
    total = sum(s["x"].shape[0] for s in slabs)
    while True:
        yield slabs, {
            "cache_idx": rng.integers(0, total, size=(k, batch)).astype(np.int32),
            "coef": rng.normal(size=(k, batch)).astype(np.float32),
        }


def _make_solver(max_iter, seed=0, **kw):
    rng = np.random.default_rng(seed)
    params = {"w": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}
    cfg = SolverConfig(solver_type="adam", base_lr=1e-3, max_iter=max_iter)
    return Solver(cfg, make_cache_gather_loss(_toy_loss), params, display=0, **kw)


def test_solve_cached_matches_solve():
    """solve_cached over (slabs, bank) chunks == solve over the equivalent
    per-step batches: same final params, same iteration count, and the
    smoothed-loss window holds ALL K losses per chunk (not a 1-in-K sample)."""
    slabs, _, _ = _toy_setup()
    k, batch, max_iter = 3, 2, 7  # 7 = 3 + 3 + 1: exercises the partial chunk

    s1 = _make_solver(max_iter)
    s1.solve_cached(_chunk_stream(slabs, k, batch), log=lambda m: None)
    assert s1.iteration == max_iter
    assert len(s1._loss_window) == max_iter  # all 7 losses folded in

    s2 = _make_solver(max_iter)
    merged = jnp.concatenate([s["x"] for s in slabs], axis=0)

    def batches():
        for slabs_, bank in _chunk_stream(slabs, k, batch):
            for i in range(k):
                yield {"cache_x": merged, "cache_idx": bank["cache_idx"][i],
                       "coef": bank["coef"][i]}

    s2.solve(batches(), log=lambda m: None)
    assert s2.iteration == max_iter
    np.testing.assert_allclose(
        np.asarray(s1.state.params["w"]), np.asarray(s2.state.params["w"]),
        rtol=1e-6, atol=1e-7,
    )
    assert s1.smoothed_loss == pytest.approx(s2.smoothed_loss, rel=1e-5)


def test_solve_cached_guards():
    """The per-step concepts raise instead of silently degrading: iter_size
    accumulation (ADVICE r4 #2), loss schedules, meshes."""
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}
    cfg = SolverConfig(solver_type="sgd", base_lr=1e-3, max_iter=4, iter_size=2)
    s = Solver(cfg, make_cache_gather_loss(_toy_loss), params, display=0)
    slabs, _, _ = _toy_setup()
    with pytest.raises(ValueError, match="iter_size"):
        s.solve_cached(_chunk_stream(slabs, 2, 2))

    class Sched:
        def at(self, it):
            return 0

    cfg1 = SolverConfig(solver_type="sgd", base_lr=1e-3, max_iter=4)

    def loss_ep(params, batch, episode=0):
        return _toy_loss(params, batch)

    s = Solver(cfg1, make_cache_gather_loss(loss_ep), params, display=0,
               loss_schedule=Sched())
    with pytest.raises(ValueError, match="schedule"):
        s.solve_cached(_chunk_stream(slabs, 2, 2))


def test_solve_cached_snapshot_and_display_cadence(tmp_path):
    """Snapshot/display trigger whenever a chunk CROSSES an interval
    boundary (quantization <= K), and the final snapshot always lands."""
    slabs, _, _ = _toy_setup()
    logs = []
    s = _make_solver(6, snapshot_dir=str(tmp_path), snapshot_interval=2)
    s.display = 2
    s.solve_cached(_chunk_stream(slabs, 3, 2), log=logs.append)
    assert s.iteration == 6
    snaps = sorted(p for p in os.listdir(tmp_path) if p.startswith("iter_"))
    # chunks end at 3 and 6; 3 crosses the it=2 boundary, 6 crosses it=4 and 6
    assert "iter_0000003" in snaps and "iter_0000006" in snaps
    assert any("Iteration 3" in m for m in logs)
    assert any("Iteration 6" in m for m in logs)


def test_solve_cached_signal_stop():
    """A stop request (SIGINT action) is honored at the next chunk boundary."""
    slabs, _, _ = _toy_setup()
    s = _make_solver(100)

    def stream():
        for slabs_, bank in _chunk_stream(slabs, 4, 2):
            s._requested_action = "stop"  # as the signal handler would
            yield slabs_, bank

    s.solve_cached(stream(), log=lambda m: None)
    assert s.iteration == 4  # the in-flight chunk finishes, then the loop stops
