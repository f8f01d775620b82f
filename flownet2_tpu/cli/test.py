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
    args = p.parse_args(argv)

    import numpy as np

    from flownet2_tpu.cli.run_flownet import load_weights, resolve_model_name
    from flownet2_tpu.data import BatchLoader, open_dataset
    from flownet2_tpu.inference import FlowRunner
    from flownet2_tpu.ops.losses import epe

    import jax.numpy as jnp

    model = resolve_model_name(args.model)
    params = load_weights(args.weights, model)
    runner = FlowRunner(model, params)

    dataset = open_dataset(args.dataset, args.data_root)
    loader = BatchLoader(dataset, args.batch, shuffle_seed=None, epochs=1)
    total, count = 0.0, 0
    for i, batch in enumerate(loader):
        if args.iterations and i >= args.iterations:
            break
        flow = runner.batch(batch["img0"], batch["img1"])
        e = float(epe(jnp.asarray(flow), jnp.asarray(batch["flow"])))
        total += e
        count += 1
        print(f"Batch {i}, EPE = {e:.4f}")
    if count == 0:
        raise SystemExit("no batches evaluated")
    print(f"Loss: average EPE over {count} batches = {total / count:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
