"""train: the ``caffe train`` brew command (tools/caffe.cpp:154-226).

    train.py --model flownets --dataset flyingchairs --data-root DIR
             [--weights W.npz] [--snapshot DIR/iter_xxx] [--schedule S_long]
             [--batch 8] [--crop 320x448] ...

Maps the reference flags: ``--weights`` copies matching layers for
finetuning, ``--snapshot`` resumes a full TrainState, ``--gpu`` becomes the
mesh size (all local devices by default — the multi-device path is a mesh,
not per-GPU solver threads).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="flownets", help="flownets|flownetc|flownet2-sd")
    p.add_argument(
        "--loss",
        default=None,
        help="objective override (e.g. flownet2-sd-sdhom for ChairsSDHom with "
        "black augmentation + Lpq, flownet2-s1/-s2 for frozen-upstream "
        "cascade-stage finetuning); defaults to the model's standard loss",
    )
    p.add_argument("--dataset", default="flyingchairs")
    p.add_argument("--data-root", required=True)
    p.add_argument("--schedule", default="S_long", help="S_long|S_short|S_fine")
    p.add_argument(
        "--base-lr", type=float, default=None,
        help="override the schedule's base learning rate (the solver "
        "prototxt's base_lr field, caffe.proto:159)",
    )
    p.add_argument("--solver", default="adam", help="sgd|nesterov|adagrad|rmsprop|adadelta|adam")
    p.add_argument("--batch", type=int, default=8, help="PER-DEVICE batch size")
    p.add_argument(
        "--gpu", default=None, metavar="IDS",
        help="data-parallel devices: 'all', a count, or a comma list of "
        "device indices (the reference's `caffe train -gpu 0,1` / 'all', "
        "tools/caffe.cpp:175-197). Effective batch = --batch x n_devices "
        "(docs/multigpu.md:11). Default: single device",
    )
    p.add_argument("--crop", default="320x448", help="HxW training crop")
    p.add_argument("--iter-size", type=int, default=1)
    p.add_argument("--max-iter", type=int, default=0, help="0: schedule default")
    p.add_argument("--weights", default=None, help="finetune from .npz/.caffemodel")
    p.add_argument("--snapshot", default=None, help="resume from orbax snapshot dir")
    p.add_argument("--snapshot-dir", default="snapshots")
    p.add_argument("--snapshot-interval", type=int, default=50000)
    p.add_argument("--display", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument(
        "--recompute-mean", type=int, default=0, metavar="K",
        help="running-mean window: update a per-pixel mean of the augmented "
        "images for K iterations, subtract it each step (AugmentationParameter."
        "recompute_mean, data_augmentation_layer.cu:592-635)",
    )
    p.add_argument(
        "--mean-per-pixel", action="store_true",
        help="subtract the full per-pixel mean instead of its per-channel average",
    )
    p.add_argument(
        "--device-cache", type=int, default=0, metavar="N",
        help="hold a rolling cache of N samples in device HBM (transport-"
        "encoded) and draw training batches from it by on-device gather; a "
        "background thread refreshes the cache from the dataset at whatever "
        "rate the host link sustains. Decouples step rate from host-link "
        "bandwidth (data/device_cache.py). Single-device only.",
    )
    p.add_argument(
        "--cache-slab", type=int, default=64, metavar="K",
        help="samples per cache slab (refresh granularity; --device-cache "
        "rounds up to a multiple of this)",
    )
    p.add_argument(
        "--steps-per-dispatch", type=int, default=0, metavar="K",
        help="with --device-cache: run K iterations per jitted dispatch "
        "(one lax.scan program over a pre-uploaded index/coefficient bank; "
        "train/solver.make_multistep_train_step) so a high-latency host "
        "link is touched once per K steps. 0 = auto (32 with "
        "--device-cache, else 1). Display/snapshot quantize to K.",
    )
    p.add_argument(
        "--write-augmented", default=None, metavar="DIR",
        help="debug: dump augmented batches + coefficient log to DIR every "
        "display interval (AugmentationParameter.write_augmented)",
    )
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from flownet2_tpu.data import BatchLoader, open_dataset
    from flownet2_tpu.data.augment_pipeline import make_flownet_augmenter
    from flownet2_tpu.inference import MODEL_INITS
    from flownet2_tpu.train import Solver, SolverConfig
    from flownet2_tpu.train.lr_policies import FLOWNET_SCHEDULES
    from flownet2_tpu.train.objectives import LOSSES

    loss_key = args.loss or args.model
    if loss_key not in LOSSES:
        raise SystemExit(f"no training objective {loss_key!r}; choose {sorted(LOSSES)}")
    crop_h, crop_w = (int(v) for v in args.crop.split("x"))

    sched = dict(FLOWNET_SCHEDULES[args.schedule])
    max_iter = args.max_iter or sched.pop("max_iter")
    sched.pop("max_iter", None)
    if args.base_lr is not None:
        sched["base_lr"] = args.base_lr
    config = SolverConfig(
        solver_type=args.solver,
        lr_policy=sched["policy"],
        base_lr=sched["base_lr"],
        gamma=sched.get("gamma", 0.1),
        stepvalues=sched.get("stepvalues", ()),
        max_iter=max_iter,
        momentum=0.9,
        momentum2=0.999,
        iter_size=args.iter_size,
    )

    from flownet2_tpu.data.augment_pipeline import (
        FlowNetAugConfig,
        make_augmented_loss,
    )

    # One config object feeds BOTH the host sampler and the device path
    # (make_augmented_loss derives its spatial method from it — mirror
    # configs route to the exact warp, ADVICE r4 #3).
    aug_config = FlowNetAugConfig()
    loss_fn = LOSSES[loss_key]
    means = []
    if not args.no_augment:
        loss_fn = make_augmented_loss(
            loss_fn, crop_h, crop_w, seed=args.seed,
            mean_window=args.recompute_mean, mean_per_pixel=args.mean_per_pixel,
            config=aug_config,
        )
        if args.recompute_mean > 0:
            from flownet2_tpu.data.mean import MeanRecompute

            means = [
                MeanRecompute(crop_h, crop_w, 3, window=args.recompute_mean,
                              per_pixel=args.mean_per_pixel)
                for _ in range(2)
            ]
    if args.device_cache > 0:
        from flownet2_tpu.data.device_cache import make_cache_gather_loss

        loss_fn = make_cache_gather_loss(loss_fn)

    mesh = None
    total_batch = args.batch
    if args.gpu is not None:
        from flownet2_tpu.parallel import MeshConfig, make_mesh

        devices = jax.devices()
        if args.gpu == "all":
            picked = devices
        elif "," in args.gpu:
            picked = [devices[int(i)] for i in args.gpu.split(",")]
        else:
            picked = devices[: int(args.gpu)]
        if len(picked) > 1:
            mesh = make_mesh(MeshConfig(data=len(picked), spatial=1), picked)
            total_batch = args.batch * len(picked)

    params = MODEL_INITS[args.model](jax.random.PRNGKey(args.seed))
    solver = Solver(
        config,
        loss_fn,
        params,
        snapshot_dir=args.snapshot_dir,
        snapshot_interval=args.snapshot_interval,
        display=args.display,
        mesh=mesh,
    )
    solver.install_signal_handlers()
    for i, m in enumerate(means):
        solver.register_extra(f"mean{i}", m)

    if args.weights:
        from flownet2_tpu.cli.run_flownet import load_weights

        solver.copy_weights_from(load_weights(args.weights, args.model))
    if args.snapshot:
        solver.restore(args.snapshot)

    dataset = open_dataset(args.dataset, args.data_root)
    base_transform = (
        None if args.no_augment else make_flownet_augmenter(crop_h, crop_w, aug_config)
    )
    transform = base_transform
    last_batch = {}  # most recent augmented batch, for --write-augmented
    if base_transform is not None and args.write_augmented:
        def transform(batch, rng, _base=base_transform):  # noqa: E306
            batch = _base(batch, rng)
            last_batch["batch"] = batch
            return batch

    # The running mean attaches at STEP time (Solver.batch_hook), not in the
    # prefetching transform: with prefetch depth > 1 a transform-time attach
    # would hand the device a mean/counter that lags the host mirror by the
    # queue depth (the reference updates its mean blobs synchronously inside
    # Forward, data_augmentation_layer.cu:592-635).
    batch_hook = None
    if means:
        def batch_hook(batch):  # noqa: E306
            for m, k in zip(means, ("mean_image0", "mean_image1")):
                batch = m.attach(batch, key=k)
            return batch

    cache = None
    steps_per_dispatch = args.steps_per_dispatch or (32 if args.device_cache else 1)
    if args.device_cache > 0:
        if mesh is not None:
            raise SystemExit("--device-cache is single-device (see device_cache.py)")
        if args.write_augmented:
            raise SystemExit("--device-cache does not support --write-augmented")
        if steps_per_dispatch > 1 and args.recompute_mean:
            raise SystemExit(
                "--recompute-mean needs per-step aux; use --steps-per-dispatch 1"
            )
        from flownet2_tpu.data.device_cache import (
            CacheBatches,
            CacheChunks,
            DeviceSampleCache,
            cycle_dataset,
        )
        from flownet2_tpu.data.records import FlowRecordReader

        if isinstance(dataset, FlowRecordReader):
            dataset.transport = True  # uint8/int16 uploads, decode on device
        sample_iter = cycle_dataset(dataset, seed=args.seed)
        if args.no_augment:
            # crop before caching (the augmented path crops on device)
            def _cropped(it, ch=crop_h, cw=crop_w):
                for s in it:
                    h, w = s["img0"].shape[:2]
                    y0, x0 = (h - ch) // 2, (w - cw) // 2
                    yield {k: v[y0 : y0 + ch, x0 : x0 + cw] for k, v in s.items()}

            sample_iter = _cropped(sample_iter)
        probe = dataset[0]
        src_h, src_w = (crop_h, crop_w) if args.no_augment else probe["img0"].shape[:2]
        n_slabs = max(2, -(-args.device_cache // args.cache_slab))
        cache = DeviceSampleCache(
            sample_iter, slab_samples=args.cache_slab, n_slabs=n_slabs
        )
        aug_sampler = None
        if not args.no_augment:
            from flownet2_tpu.data.augment_pipeline import sample_aug_arrays

            def aug_sampler(rng, n, _cfg=aug_config):  # noqa: E306
                return sample_aug_arrays(_cfg, rng, n, src_h, src_w, crop_h, crop_w)

        if steps_per_dispatch > 1:
            loader = CacheChunks(
                cache, total_batch, steps_per_dispatch,
                seed=args.seed, aug_sampler=aug_sampler,
            )
        else:
            loader = CacheBatches(
                cache, total_batch, seed=args.seed, aug_sampler=aug_sampler
            )
    else:
        loader = BatchLoader(
            dataset,
            total_batch,
            crop=None if transform else (crop_h, crop_w),
            shuffle_seed=args.seed,
            transform=transform,
        )
    print(
        f"Training {args.model} on {args.dataset} ({len(dataset)} samples), "
        f"{max_iter} iterations, crop {crop_h}x{crop_w}, batch {total_batch}"
        + (f" ({args.batch} x {dict(mesh.shape)['data']} devices)" if mesh else "")
        + (f", device cache {cache.stats()['capacity_samples']} samples" if cache else "")
    )

    def on_step(it, loss, aux):
        for m, k in zip(means, ("aug_batch_mean0", "aug_batch_mean1")):
            if k in aux:
                m.update(np.asarray(aux[k]))
        if args.write_augmented and args.display and it % args.display == 0:
            from flownet2_tpu.data.augment_pipeline import write_augmented

            batch = last_batch.get("batch")
            if batch is not None and "aug_mat0" in batch:
                write_augmented(batch, args.write_augmented, it, crop_h, crop_w)
            for i, m in enumerate(means):
                m.write_mean(os.path.join(args.write_augmented, f"mean{i}.float3"))

    try:
        if cache is not None and steps_per_dispatch > 1:
            solver.solve_cached(iter(loader), max_iter=max_iter)
        else:
            solver.solve(
                iter(loader), max_iter=max_iter, on_step=on_step, batch_hook=batch_hook
            )
    finally:
        if cache is not None:
            cache.stop()
    if cache is not None:
        st = cache.stats()
        print(
            f"Device cache: {st['slabs_swapped']} slab refreshes, "
            f"{st['samples_uploaded']} samples uploaded "
            f"({st['bytes_uploaded'] / 1e6:.0f} MB)"
        )
    print(f"Optimization done, final smoothed loss {solver.smoothed_loss:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
