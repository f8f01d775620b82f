"""Device sample cache + transport-domain batches (data/device_cache.py,
records transport mode, core/codec device decode).

The cache is the TPU-era answer to the reference's prefetch rings
(custom_data_layer.cpp:139-305): when the host link, not the host, is the
bottleneck, batches assemble ON DEVICE from an HBM-resident slab ring.
These tests run the full path on CPU: transport reader → cache fill →
background refresh → on-device gather → augmented training step, and
assert numerical equivalence with the direct (uploaded-batch) path.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flownet2_tpu.core.codec import (
    decode_flow_int16,
    encode_flow_int16,
    flow_as_f32_device,
)
from flownet2_tpu.data.device_cache import (
    CacheBatches,
    DeviceSampleCache,
    cycle_dataset,
    make_cache_gather_loss,
)
from flownet2_tpu.data.records import FlowRecordReader, FlowRecordWriter


@pytest.fixture()
def rec_path(tmp_path):
    rng = np.random.default_rng(7)
    path = str(tmp_path / "cache_test.flowrec")
    with FlowRecordWriter(path) as w:
        for _ in range(12):
            w.write(
                rng.integers(0, 255, (64, 96, 3), np.uint8),
                rng.integers(0, 255, (64, 96, 3), np.uint8),
                rng.uniform(-10, 10, (64, 96, 2)).astype(np.float32),
            )
    return path


def test_transport_reader_matches_decoded(rec_path):
    dec = FlowRecordReader(rec_path)
    raw = FlowRecordReader(rec_path, transport=True)
    for i in (0, 5, 11):
        a, b = dec[i], raw[i]
        assert b["img0"].dtype == np.uint8 and b["flow"].dtype == np.int16
        np.testing.assert_array_equal(a["img0"], b["img0"].astype(np.float32))
        np.testing.assert_allclose(a["flow"], decode_flow_int16(b["flow"]))


def test_device_flow_decode_matches_host():
    rng = np.random.default_rng(0)
    flow = rng.uniform(-100, 100, (4, 8, 8, 2)).astype(np.float32)
    flow[0, 0, 0, 0] = np.nan
    enc = encode_flow_int16(flow)
    host = decode_flow_int16(enc)
    dev = np.asarray(flow_as_f32_device(jnp.asarray(enc)))
    np.testing.assert_allclose(host, dev, atol=0)
    # floats pass through untouched
    np.testing.assert_array_equal(
        np.asarray(flow_as_f32_device(jnp.asarray(flow))), flow
    )


def test_cache_fill_and_refresh(rec_path):
    ds = FlowRecordReader(rec_path, transport=True)
    cache = DeviceSampleCache(
        cycle_dataset(ds, seed=0), slab_samples=4, n_slabs=2, refresh=True
    )
    try:
        rng = np.random.default_rng(0)
        slab = cache.draw_slab(rng)
        assert slab["img0"].shape == (4, 64, 96, 3)
        assert slab["img0"].dtype == jnp.uint8
        assert slab["flow"].dtype == jnp.int16
        # echo cap: with NO consumer draws the refresher must stay idle
        # (an unthrottled loop starves the link — see DeviceSampleCache)
        time.sleep(0.5)
        assert cache.slabs_swapped == 0, "refresh ran without any draws"
        # report draws -> refresh resumes
        deadline = time.time() + 30
        while cache.slabs_swapped < 2 and time.time() < deadline:
            cache.note_drawn(4)
            time.sleep(0.05)
        assert cache.slabs_swapped >= 2, "background refresh never swapped a slab"
        st = cache.stats()
        assert st["samples_uploaded"] >= 8 + 8
        assert st["capacity_samples"] == 8
        assert st["samples_drawn"] > 0
    finally:
        cache.stop()


def test_cache_gather_loss_matches_direct(rec_path):
    """Gathered-from-cache batches produce bit-identical losses to the same
    batch uploaded directly (the cache is a transport, not a model change)."""
    from flownet2_tpu.data.augment_pipeline import (
        FlowNetAugConfig,
        make_augmented_loss,
        sample_aug_arrays,
    )
    from flownet2_tpu.models.flownet_c import flownet_c_init
    from flownet2_tpu.train.objectives import flownet_c_loss

    ds = FlowRecordReader(rec_path, transport=True)
    cache = DeviceSampleCache(
        cycle_dataset(ds, seed=0), slab_samples=6, n_slabs=1, refresh=False
    )
    params = flownet_c_init(jax.random.PRNGKey(0))
    crop_h, crop_w = 64, 64
    aug_loss = make_augmented_loss(flownet_c_loss, crop_h, crop_w)
    cache_loss = make_cache_gather_loss(aug_loss)

    rng = np.random.default_rng(3)
    aug = sample_aug_arrays(FlowNetAugConfig(), rng, 3, 64, 96, crop_h, crop_w)
    idx = np.array([1, 4, 2], np.int32)
    slab = cache.draw_slab(rng)
    cache_batch = {f"cache_{k}": v for k, v in slab.items()}
    cache_batch.update(cache_idx=idx, **aug)
    loss_c, _ = jax.jit(cache_loss)(params, cache_batch)

    direct = {k: np.asarray(v)[idx] for k, v in slab.items()}
    direct.update(aug)
    loss_d, _ = jax.jit(aug_loss)(params, direct)
    assert float(loss_c) == pytest.approx(float(loss_d), rel=1e-6)


def test_cache_batches_iterator_trains(rec_path):
    """End-to-end: CacheBatches feeds Solver.solve, loss stays finite, the
    solver's loop never forces a per-step sync (loss window holds device
    scalars until display)."""
    import optax

    from flownet2_tpu.data.augment_pipeline import (
        FlowNetAugConfig,
        make_augmented_loss,
        sample_aug_arrays,
    )
    from flownet2_tpu.models.flownet_c import flownet_c_init
    from flownet2_tpu.train.objectives import flownet_c_loss
    from flownet2_tpu.train.solver import Solver
    from flownet2_tpu.train.solvers import SolverConfig

    ds = FlowRecordReader(rec_path, transport=True)
    cache = DeviceSampleCache(
        cycle_dataset(ds, seed=0), slab_samples=4, n_slabs=2, refresh=False
    )
    crop_h = crop_w = 64
    loss_fn = make_cache_gather_loss(
        make_augmented_loss(flownet_c_loss, crop_h, crop_w)
    )
    cfg = SolverConfig(solver_type="adam", base_lr=1e-4, max_iter=4)
    solver = Solver(cfg, loss_fn, flownet_c_init(jax.random.PRNGKey(0)), display=0)

    def aug_sampler(rng, n):
        return sample_aug_arrays(FlowNetAugConfig(), rng, n, 64, 96, crop_h, crop_w)

    batches = CacheBatches(cache, 2, seed=0, aug_sampler=aug_sampler)
    it = iter(batches)
    losses = [solver.step(next(it))[0] for _ in range(3)]
    # device-resident scalars, not python floats (the async contract)
    assert all(hasattr(l, "dtype") for l in losses)
    assert np.isfinite(solver.smoothed_loss)
    assert solver.iteration == 3


def test_solver_sync_bound(rec_path):
    """The in-flight bound forces a host sync every sync_bound steps."""
    from flownet2_tpu.train.solver import Solver
    from flownet2_tpu.train.solvers import SolverConfig

    calls = []

    def loss_fn(params, batch):
        return jnp.sum(params["w"] * batch["x"]), {}

    cfg = SolverConfig(solver_type="sgd", base_lr=1e-3, max_iter=10)
    solver = Solver(cfg, loss_fn, {"w": jnp.ones((4,))}, display=0)
    solver.sync_bound = 3
    for i in range(7):
        solver.step({"x": jnp.full((4,), float(i))})
        calls.append(solver._steps_since_sync)
    # resets at steps 3 and 6
    assert calls == [1, 2, 0, 1, 2, 0, 1]
