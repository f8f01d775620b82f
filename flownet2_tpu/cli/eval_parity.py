"""eval-parity: EPE-parity harness against reference outputs or ground truth.

The BASELINE.md north star demands Sintel-clean EPE delta < 0.05 vs the
Caffe reference once the released caffemodels are reachable
(models/download-models.sh assets; VERDICT r1 missing.1). This harness makes
that validation a one-command affair:

  # our model vs reference-produced (or ground-truth) .flo files
  eval-parity --model flownet2 --weights FlowNet2_weights.caffemodel[.h5] \
      --list pairs.txt [--dtype float32] [--out-dir flo_out/]

  # byte-level comparison of two .flo directories/sets
  eval-parity --flo-a ours/ --flo-b reference/

``pairs.txt`` lines: ``img0 img1 ref.flo`` — the reference's
run-flownet-many list format (scripts/run-flownet-many.py:20-30) with the
output column pointing at the flows to compare against.

Prints one JSON line: {"pairs", "mean_epe", "max_epe", "worst_file"} — the
mean is the mean-over-pairs of per-pair average endpoint error between our
prediction and the listed .flo.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _epe(a, b) -> float:
    import numpy as np

    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.sqrt(((a - b) ** 2).sum(-1)).mean())


def compare_flo_sets(dir_a: str, dir_b: str) -> dict:
    from flownet2_tpu.core.flow_io import read_flo

    if os.path.isdir(dir_a):
        names = sorted(n for n in os.listdir(dir_a) if n.endswith(".flo"))
        pairs = [(os.path.join(dir_a, n), os.path.join(dir_b, n)) for n in names]
    else:
        pairs = [(dir_a, dir_b)]
    epes = [( _epe(read_flo(a), read_flo(b)), a) for a, b in pairs]
    worst = max(epes) if epes else (0.0, "")
    return {
        "pairs": len(epes),
        "mean_epe": round(sum(e for e, _ in epes) / max(len(epes), 1), 6),
        "max_epe": round(worst[0], 6),
        "worst_file": os.path.basename(worst[1]),
    }


def run_model_parity(args) -> dict:
    import numpy as np

    from flownet2_tpu.cli.run_flownet import load_weights, resolve_model_name
    from flownet2_tpu.core.flow_io import read_flo, read_image, write_flo
    from flownet2_tpu.inference import FlowRunner

    model = resolve_model_name(args.model)
    params = load_weights(args.weights, model)
    # Parity runs are exact-by-construction: every internal FlowWarp takes
    # the reference-exact gather path (flow_warp_layer.cpp:58-117) unless
    # --warp fast opts into the throughput path.
    runner = FlowRunner(
        model,
        params,
        dtype=args.dtype,
        warp_method="gather" if args.warp == "exact" else None,
    )

    epes = []
    with open(args.list) as f:
        lines = [l.split() for l in f if l.strip()]
    for img0_p, img1_p, ref_p in lines:
        img0 = read_image(img0_p)
        img1 = read_image(img1_p)
        pred = runner(img0, img1)
        ref = read_flo(ref_p)
        epes.append((_epe(pred, ref), ref_p))
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            write_flo(
                os.path.join(args.out_dir, os.path.basename(ref_p)), pred
            )
    worst = max(epes) if epes else (0.0, "")
    return {
        "pairs": len(epes),
        "mean_epe": round(sum(e for e, _ in epes) / max(len(epes), 1), 6),
        "max_epe": round(worst[0], 6),
        "worst_file": os.path.basename(worst[1]),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", help="model name or deploy-template path")
    p.add_argument("--weights", help=".npz / .caffemodel / .caffemodel.h5 / 'random'")
    p.add_argument("--list", help="lines: img0 img1 ref.flo")
    p.add_argument("--flo-a", help="compare mode: .flo file or directory")
    p.add_argument("--flo-b", help="compare mode: .flo file or directory")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument(
        "--warp",
        default="exact",
        choices=["exact", "fast"],
        help="internal FlowWarp routing: 'exact' (default) forces the "
        "reference-exact gather warp; 'fast' keeps the auto fast path "
        "(clamps >budget per-tile flow variation — not for parity claims)",
    )
    p.add_argument("--out-dir", help="also dump our predictions here as .flo")
    args = p.parse_args(argv)

    if args.flo_a and args.flo_b:
        result = compare_flo_sets(args.flo_a, args.flo_b)
    elif args.model and args.weights and args.list:
        result = run_model_parity(args)
    else:
        p.error("need either --flo-a/--flo-b or --model/--weights/--list")
    print(json.dumps(result))
    return 0 if result["pairs"] else 1


if __name__ == "__main__":
    sys.exit(main())
