#!/usr/bin/env python
"""Headline benchmark: FlowNet2 full-cascade inference throughput.

Measures image-pairs/sec at 448x320 (the FlyingChairs training resolution,
reference README.md:100-106) on the available accelerator, and compares
against the reference's paper-sourced FlowNet2 runtime of ~123 ms/pair on a
GTX 1080 at Sintel resolution (BASELINE.md) => ~8.13 pairs/sec.

Extra metrics (same JSON line, "extra" field):
  - sintel_1024x448_pairs_per_sec: full cascade at Sintel-scale resolution
    (the resolution the 123 ms/pair baseline is quoted at);
  - train_flownetc_448x320_pairs_per_sec: FlowNetC train-step throughput
    (fwd+bwd+SGD update, the reference's solver.cpp:194 hot loop), f32
    master weights with bf16 compute (mixed precision).

Timing methodology (IMPORTANT): on the remote-TPU tunnel used here,
jax.block_until_ready does NOT actually block and repeated executions get
deduplicated, so naive timing loops report fantasy numbers. Every metric
below runs N data-dependent iterations inside ONE jitted fori_loop, forces
completion with a scalar host fetch, and differences two N values to cancel
the fixed dispatch/round-trip overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from flownet2_tpu.core.hostmem import tune_host_allocator

tune_host_allocator()  # host batch churn (see core/hostmem.py)

REF_PAIRS_PER_SEC = 1000.0 / 123.0  # GTX 1080, FlowNet2 paper (BASELINE.md)


from flownet2_tpu.tools.timing import chain_ms  # the shared methodology core


def bench_inference(h, w, batch, dtype, n1, n2):
    from flownet2_tpu.models import flownet2_apply, flownet2_init

    params = flownet2_init(jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), dtype)
    img1 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), dtype)
    ms = chain_ms(lambda a, p, b: flownet2_apply(p, a, b), img0, (params, img1), n1, n2)
    return batch / (ms / 1000)


def bench_train(h, w, batch, n1, n2, *, model="flownetc"):
    """Train step (fwd+bwd+update), bf16 compute / f32 master.

    model="flownetc": the siamese+correlation net (the r1 metric).
    model="s1": the FlowNet2-S1 cascade stage — frozen FlowNetC, full-res
    FlowWarp (fwd + the hand-VJP backward) and the S1 refinement net, i.e.
    the stage-wise training recipe's hot loop."""
    import optax

    from flownet2_tpu.models import flownet2_init
    from flownet2_tpu.models.flownet_c import flownet_c_init
    from flownet2_tpu.train.objectives import (
        LOSSES,
        flownet_c_loss,
        with_compute_dtype,
    )

    if model == "s1":
        params = flownet2_init(jax.random.PRNGKey(0))
        loss_base = LOSSES["flownet2-s1"]
    else:
        params = flownet_c_init(jax.random.PRNGKey(0))
        loss_base = flownet_c_loss
    tx = optax.sgd(1e-4, momentum=0.9)
    opt_state = tx.init(params)
    loss_fn = with_compute_dtype(loss_base, jnp.bfloat16)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-20, 20, (batch, h, w, 2)), jnp.float32)

    def step(img0, params, opt_state, img1, flow):
        batch_d = {"img0": img0, "img1": img1, "flow": flow}
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch_d)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # chain on params/opt_state through the loop for true dependence
    @jax.jit
    def run(img0, params, opt_state, img1, flow, n):
        def body(i, carry):
            img0c, params, opt_state, acc = carry
            params, opt_state, loss = step(img0c, params, opt_state, img1, flow)
            return (img0c + (loss * 1e-30).astype(img0c.dtype), params, opt_state, acc + loss)

        _, _, _, acc = lax.fori_loop(0, n, body, (img0, params, opt_state, jnp.float32(0)))
        return acc

    def timed(n):
        t0 = time.perf_counter()
        float(run(img0, params, opt_state, img1, flow, n))
        return time.perf_counter() - t0

    timed(n1)
    t1 = min(timed(n1) for _ in range(2))
    t2 = min(timed(n2) for _ in range(2))
    ms = (t2 - t1) / (n2 - n1) * 1000
    return batch / (ms / 1000)


def bench_train_sd_sdhom(h, w, batch, n1, n2):
    """SD net with the ChairsSDHom objective: BlackAugmentation + scheduled
    Lpq losses (the small-displacement training recipe, SURVEY.md §2.2) —
    fwd+bwd+update, bf16 compute / f32 master."""
    import optax

    from flownet2_tpu.models.flownet_sd import flownet_sd_init
    from flownet2_tpu.train.objectives import LOSSES, with_compute_dtype

    params = flownet_sd_init(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-4, momentum=0.9)
    opt_state = tx.init(params)
    loss_fn = with_compute_dtype(LOSSES["flownet2-sd-sdhom"], jnp.bfloat16)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 255, (batch, h, w, 3)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-2, 2, (batch, h, w, 2)), jnp.float32)
    black = jnp.asarray(rng.uniform(0, 1, (batch,)) < 0.1, jnp.float32)
    border = jnp.asarray(rng.uniform(0, 0.2, (batch,)), jnp.float32)

    def step(img0, params, opt_state, img1, flow):
        b = {"img0": img0, "img1": img1, "flow": flow,
             "black_mask": black, "border_frac": border}
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run(img0, params, opt_state, img1, flow, n):
        def body(i, carry):
            img0c, params, opt_state, acc = carry
            params, opt_state, loss = step(img0c, params, opt_state, img1, flow)
            return (img0c + (loss * 1e-30).astype(img0c.dtype), params, opt_state,
                    acc + loss)

        _, _, _, acc = lax.fori_loop(0, n, body, (img0, params, opt_state, jnp.float32(0)))
        return acc

    def timed(n):
        t0 = time.perf_counter()
        float(run(img0, params, opt_state, img1, flow, n))
        return time.perf_counter() - t0

    timed(n1)
    t1 = min(timed(n1) for _ in range(2))
    t2 = min(timed(n2) for _ in range(2))
    ms = (t2 - t1) / (n2 - n1) * 1000
    return batch / (ms / 1000)


def _write_synth_flowrec(n_samples, h=384, w=512):
    import tempfile

    from flownet2_tpu.data.records import FlowRecordWriter

    rng = np.random.default_rng(0)
    path = tempfile.mktemp(suffix=".flowrec", dir="/tmp")
    wtr = FlowRecordWriter(path)
    for _ in range(n_samples):  # FlyingChairs-native 384x512 samples
        wtr.write(
            rng.integers(0, 255, (h, w, 3), np.uint8),
            rng.integers(0, 255, (h, w, 3), np.uint8),
            rng.uniform(-20, 20, (h, w, 2)).astype(np.float32),
        )
    wtr.close()
    return path


def bench_train_streaming(crop_h, crop_w, batch, iters, *, n_samples=24):
    """End-to-end training with every batch STREAMED host→device: .flowrec
    dataset read in the transport domain (uint8 images + int16 flow — 3.2×
    fewer upload bytes than f32; decode runs on device), BatchLoader worker
    threads + DevicePrefetcher double-buffered uploads, async dispatch with
    no per-step host sync (the loss stays device-resident, exactly like the
    production Solver.step). The reference contract being matched: CustomData
    prefetch keeping the device fed, custom_data_layer.cpp:139-305.

    On this harness the number is a measurement of the remote-TPU tunnel's
    ~25 MB/s H2D bandwidth, not of the framework (see docs/DESIGN_NOTES.md
    "End-to-end training latency budget"): ~15.7 MB/step of fresh pixels is
    the irreducible stream. On hardware with a real PCIe/DMA host link the
    same loop is compute-bound."""
    import optax

    from flownet2_tpu.data import BatchLoader, DevicePrefetcher
    from flownet2_tpu.data.augment_pipeline import (
        make_augmented_loss,
        make_flownet_augmenter,
    )
    from flownet2_tpu.data.records import FlowRecordReader
    from flownet2_tpu.models.flownet_c import flownet_c_init
    from flownet2_tpu.train.objectives import flownet_c_loss, with_compute_dtype

    path = _write_synth_flowrec(n_samples)
    params = flownet_c_init(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-4, momentum=0.9)
    opt_state = tx.init(params)
    loss_fn = make_augmented_loss(
        with_compute_dtype(flownet_c_loss, jnp.bfloat16), crop_h, crop_w
    )

    @jax.jit
    def step(params, opt_state, batch_d):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch_d)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loader = BatchLoader(
        FlowRecordReader(path, transport=True),
        batch,
        transform=make_flownet_augmenter(crop_h, crop_w),
        num_threads=2,
        prefetch=4,
    )
    it = iter(DevicePrefetcher(iter(loader), depth=2))
    # warm up: compile + fill the prefetch/upload rings
    params, opt_state, loss = step(params, opt_state, next(it))
    float(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, next(it))
    float(loss)  # forces the whole dispatched chain (params thread through)
    dt = time.perf_counter() - t0
    os.unlink(path)
    return batch * iters / dt


def bench_train_device_cache(
    crop_h, crop_w, batch, iters, *, n_samples=96, steps_per_dispatch=32
):
    """End-to-end training through the production pipeline with the device
    sample cache + multi-step dispatch (`cli/train.py --device-cache`
    exactly): transport-encoded samples live in an HBM slab ring, each
    dispatch runs `steps_per_dispatch` iterations as ONE lax.scan program
    (train/solver.make_multistep_train_step) whose per-step batches gather
    + augment ON DEVICE (fresh random crops/affines per draw); the host
    uploads one ~KB index/coefficient bank per dispatch and a background
    thread refreshes slabs at link rate. This is the loop the 115× r3 gap
    (VERDICT next.1) demanded — single-step CacheBatches paid ~10 small
    uploads × 53 ms tunnel RTT per step (measured 6.4 pairs/s)."""
    import optax

    from flownet2_tpu.data.augment_pipeline import (
        FlowNetAugConfig,
        make_augmented_loss,
        sample_aug_arrays,
    )
    from flownet2_tpu.data.device_cache import (
        CacheChunks,
        DeviceSampleCache,
        cycle_dataset,
        make_cache_gather_loss,
    )
    from flownet2_tpu.data.records import FlowRecordReader
    from flownet2_tpu.models.flownet_c import flownet_c_init
    from flownet2_tpu.train.objectives import flownet_c_loss, with_compute_dtype
    from flownet2_tpu.train.solver import TrainState, make_multistep_train_step

    path = _write_synth_flowrec(n_samples)
    src_h, src_w = 384, 512
    params = flownet_c_init(jax.random.PRNGKey(0))
    tx = optax.sgd(1e-4, momentum=0.9)
    loss_fn = make_cache_gather_loss(
        make_augmented_loss(
            with_compute_dtype(flownet_c_loss, jnp.bfloat16), crop_h, crop_w
        )
    )
    run = make_multistep_train_step(loss_fn, tx)
    # commit to the device: an uncommitted fresh state makes the SECOND
    # dispatch recompile the whole scan program (committed-output key
    # mismatch; see Solver.__init__)
    state = jax.device_put(
        TrainState(
            params=params, opt_state=tx.init(params), iteration=jnp.zeros([], jnp.int32)
        ),
        jax.devices()[0],
    )

    ds = FlowRecordReader(path, transport=True)
    cache = DeviceSampleCache(cycle_dataset(ds, seed=0), slab_samples=24, n_slabs=2)

    def aug_sampler(rng, n):
        return sample_aug_arrays(
            FlowNetAugConfig(), rng, n, src_h, src_w, crop_h, crop_w
        )

    it = iter(
        CacheChunks(cache, batch, steps_per_dispatch, seed=0, aug_sampler=aug_sampler)
    )
    slabs, bank = next(it)
    state, losses = run(state, slabs, bank)  # compile + warm
    float(losses[-1])
    n_chunks = max(1, iters // steps_per_dispatch)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        slabs, bank = next(it)
        state, losses = run(state, slabs, bank)
    float(losses[-1])  # forces the dispatched chain (state threads through)
    dt = time.perf_counter() - t0
    cache.stop()
    os.unlink(path)
    return batch * n_chunks * steps_per_dispatch / dt


def _emit(value, extra):
    """Print the CURRENT result line (stdout, flushed). Called after every
    metric so the most-complete line is always the last stdout line — a
    hung/slow later metric can never zero the round's evidence (the r4
    failure mode: bench.py printed nothing until ALL metrics finished and
    the driver's timeout captured an empty tail, BENCH_r04.json rc=124)."""
    print(
        json.dumps(
            {
                "metric": "flownet2_448x320_pairs_per_sec",
                "value": round(value, 2) if value is not None else None,
                "unit": "pairs/s",
                "vs_baseline": round(value / REF_PAIRS_PER_SEC, 2) if value else None,
                "extra": extra,
            }
        ),
        flush=True,
    )


def main():
    import sys

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if not on_tpu:  # CPU smoke mode (dims must be /64-able)
        _emit(bench_inference(64, 128, 1, dtype, 1, 3), {})
        return

    # Metrics run in value order under a wall-clock budget: the headline
    # first, then the r4 centerpiece (the device-cache pipeline), then the
    # rest. Between metrics the remaining budget is checked; metrics that
    # don't fit are reported as skipped in "extra" rather than silently
    # absent. Tune with FLOWNET2_TPU_BENCH_BUDGET (seconds) and
    # FLOWNET2_TPU_BENCH_SUBSET (comma list of extra-keys; "headline" for
    # the main metric).
    # Default sized against the driver's ~600 s kill: the incremental emit
    # makes overruns safe (the last stdout line always holds every metric
    # completed so far), so the budget only bounds STARTING a new metric.
    budget = float(os.environ.get("FLOWNET2_TPU_BENCH_BUDGET", "520"))
    subset = os.environ.get("FLOWNET2_TPU_BENCH_SUBSET")
    subset = set(subset.split(",")) if subset else None
    t_start = time.time()

    def note(msg):
        print(f"[bench +{time.time() - t_start:5.1f}s] {msg}", file=sys.stderr, flush=True)

    main_pps = None
    extra: dict = {}
    # A parseable line lands on stdout BEFORE any device work: if the remote
    # compile service wedges mid-headline, the capture still holds valid
    # JSON (null value + the note) instead of an empty tail.
    extra["note"] = "in progress — later lines supersede"
    _emit(None, extra)
    del extra["note"]

    metrics = [
        # (key, estimated seconds, thunk)
        ("headline", 90, lambda: bench_inference(320, 448, 8, dtype, 3, 13)),
        # the production e2e pipeline (cli/train.py --device-cache)
        (
            "train_flownetc_with_pipeline_448x320_pairs_per_sec",
            90,
            lambda: bench_train_device_cache(320, 448, 8, 200),
        ),
        # throughput-optimal batches (round-5 sweep: b8 is the Sintel
        # optimum at +27% over the historical b4; b16 the 448x320 optimum)
        ("sintel_1024x448_b8_pairs_per_sec", 80, lambda: bench_inference(448, 1024, 8, dtype, 3, 13)),
        ("flownet2_448x320_b16_pairs_per_sec", 70, lambda: bench_inference(320, 448, 16, dtype, 3, 13)),
        ("sintel_1024x448_pairs_per_sec", 80, lambda: bench_inference(448, 1024, 4, dtype, 3, 13)),
        ("train_flownetc_448x320_pairs_per_sec", 60, lambda: bench_train(320, 448, 8, 3, 13)),
        ("train_s1_stage_448x320_pairs_per_sec", 70, lambda: bench_train(320, 448, 8, 3, 13, model="s1")),
        ("train_sd_sdhom_448x320_pairs_per_sec", 60, lambda: bench_train_sd_sdhom(320, 448, 8, 3, 13)),
        # fully-streamed batches: bounded by the tunnel's ~25 MB/s H2D
        # (docs/DESIGN_NOTES.md latency budget), not by the framework
        ("train_flownetc_streaming_448x320_pairs_per_sec", 60, lambda: bench_train_streaming(320, 448, 8, 12)),
    ]
    for key, est, thunk in metrics:
        if subset is not None and key not in subset:
            continue
        elapsed = time.time() - t_start
        if elapsed + est > budget and main_pps is not None:
            extra[key] = "skipped_budget"
            note(f"skip {key} (elapsed {elapsed:.0f}s + est {est}s > budget {budget:.0f}s)")
            _emit(main_pps, extra)
            continue
        note(f"start {key}")
        try:
            v = thunk()
        except Exception as e:  # one failing metric must not zero the rest
            extra[key] = f"error: {type(e).__name__}"
            note(f"{key} FAILED: {e}")
            continue
        note(f"{key} = {v:.2f} pairs/s")
        if key == "headline":
            main_pps = v
        else:
            extra[key] = round(v, 2)
        if isinstance(extra.get("sintel_1024x448_pairs_per_sec"), float):
            extra["sintel_vs_baseline"] = round(
                extra["sintel_1024x448_pairs_per_sec"] / REF_PAIRS_PER_SEC, 2
            )
        _emit(main_pps, extra)


if __name__ == "__main__":
    main()
