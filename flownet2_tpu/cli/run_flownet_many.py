"""run-flownet-many: list-file batch inference CLI.

Reference contract (scripts/run-flownet-many.py): a list file with one
``img0 img1 out.flo`` triple per line; the compiled program is reused while
the input resolution stays constant and rebuilt when it changes (:50-75 —
here that's just the FlowRunner's per-geometry jit cache).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("caffemodel", help="path to weights (.npz/.caffemodel) or 'random'")
    p.add_argument("deployproto", help="model name or deploy template path")
    p.add_argument("listfile", help="one line per job: img0 img1 out.flo")
    p.add_argument("--gpu", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    from flownet2_tpu.cli.run_flownet import load_weights, resolve_model_name

    if not os.path.exists(args.listfile):
        raise SystemExit(f"list file does not exist: {args.listfile}")
    jobs = []
    with open(args.listfile) as f:
        for ln, line in enumerate(f, 1):
            parts = line.split()
            if not parts:
                continue
            if len(parts) != 3:
                raise SystemExit(f"{args.listfile}:{ln}: expected 'img0 img1 out.flo'")
            jobs.append(parts)
    for img0, img1, _ in jobs:
        for f_ in (img0, img1):
            if not os.path.exists(f_):
                raise SystemExit(f"input does not exist: {f_}")

    import jax

    from flownet2_tpu.core.flow_io import read_image, write_flo
    from flownet2_tpu.inference import FlowRunner

    model = resolve_model_name(args.deployproto)
    params = load_weights(args.caffemodel, model)
    devices = jax.devices()
    with jax.default_device(devices[args.gpu]):
        runner = FlowRunner(model, params)
        for i, (img0_p, img1_p, out_p) in enumerate(jobs):
            flow = runner(read_image(img0_p), read_image(img1_p))
            write_flo(out_p, flow)
            print(f"[{i + 1}/{len(jobs)}] {out_p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
