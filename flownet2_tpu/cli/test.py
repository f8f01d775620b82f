"""test: score a net over a dataset (the ``caffe test`` brew command,
tools/caffe.cpp:229-300). Metric: average EPE (+ per-batch log), the
FlowNet evaluation convention."""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True, help=".npz params or 'random'")
    p.add_argument("--model", required=True)
    p.add_argument("--dataset", default="flyingchairs")
    p.add_argument("--data-root", required=True)
    p.add_argument("--iterations", type=int, default=0, help="0 = full dataset")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--warp",
        default="exact",
        choices=["exact", "fast"],
        help="internal FlowWarp routing: 'exact' (default) forces the "
        "reference-exact gather warp so the score is exact-by-construction "
        "(flow_warp_layer.cpp:58-117); 'fast' keeps the throughput auto "
        "path and SCREENS each batch's GT flow with warp_clamp_fraction, "
        "warning when the fast path's per-tile window budget clamps",
    )
    args = p.parse_args(argv)

    import numpy as np

    from flownet2_tpu.cli.run_flownet import load_weights, resolve_model_name
    from flownet2_tpu.data import BatchLoader, open_dataset
    from flownet2_tpu.inference import FlowRunner
    from flownet2_tpu.ops.losses import epe
    from flownet2_tpu.ops.warp import warp_clamp_fraction

    import jax.numpy as jnp

    model = resolve_model_name(args.model)
    params = load_weights(args.weights, model)
    runner = FlowRunner(
        model, params, warp_method="gather" if args.warp == "exact" else None
    )

    dataset = open_dataset(args.dataset, args.data_root)
    loader = BatchLoader(dataset, args.batch, shuffle_seed=None, epochs=1)
    total, count, clamped_batches = 0.0, 0, 0
    for i, batch in enumerate(loader):
        if args.iterations and i >= args.iterations:
            break
        flow = runner.batch(batch["img0"], batch["img1"])
        e = float(epe(jnp.asarray(flow), jnp.asarray(batch["flow"])))
        total += e
        count += 1
        suffix = ""
        if args.warp == "fast":
            # auto-screen: the GT flow bounds the motion the cascade's
            # internal warps see, so a clamping GT flow means the fast
            # path may have diverged from the exact warp on this batch
            frac = float(np.max(warp_clamp_fraction(np.asarray(batch["flow"]))))
            if frac > 0:
                clamped_batches += 1
                suffix = f"  [fast-warp clamp risk: {frac:.2%} of GT pixels]"
        print(f"Batch {i}, EPE = {e:.4f}{suffix}")
    if count == 0:
        raise SystemExit("no batches evaluated")
    if clamped_batches:
        print(
            f"WARNING: {clamped_batches}/{count} batches exceeded the fast "
            "warp's window budget; re-run with --warp exact for a "
            "reference-exact score"
        )
    print(f"Loss: average EPE over {count} batches = {total / count:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
