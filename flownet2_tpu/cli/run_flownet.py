"""run-flownet: single image-pair inference CLI.

Argument-compatible with the reference driver (scripts/run-flownet.py:12-19):

    run_flownet.py <weights> <model> <img0> <img1> <out> [--gpu N] [--verbose]

- ``weights``: a ``.npz`` params archive (or ``.caffemodel``/``.h5`` once
  imported via flownet2_tpu.models.import_caffe), or the literal ``random``
  for an untrained net (testing).
- ``model``: where the reference takes a deploy-prototxt template, this
  takes the model name (flownets|flownetc|flownet2-sd|flownet2-cs|
  flownet2-css|flownet2) or a path whose basename contains one — so reference
  invocations pointing at e.g. ``FlowNet2/FlowNet2_deploy.prototxt.template``
  resolve automatically.
- resolution adaptation (ceil to /64 + flow rescale) happens inside the
  jitted program (core/adapt.py) instead of prototxt text substitution.
- output is byte-compatible ``.flo`` ("PIEH", w, h, float32 HWC interleaved).
"""

from __future__ import annotations

import argparse
import os
import sys


def resolve_model_name(spec: str) -> str:
    from flownet2_tpu.inference import MODEL_NAMES

    base = os.path.basename(spec).lower().replace("_", "-").replace(".", "-")
    if spec.lower() in MODEL_NAMES:
        return spec.lower()
    # one merged table, longest pattern first, so the most specific of the
    # reference template names wins (FlowNet2-CSS-ft-sd over FlowNet2-CSS
    # over FlowNet2-CS over FlowNet2-C over FlowNet2, FlowNet2-S over
    # FlowNet2, ...)
    table = {name: name for name in MODEL_NAMES}
    table.update(
        {
            "flownet2-s": "flownets",
            "flownet2-c": "flownetc",
            "flownet2-css-ft-sd": "flownet2-css",
            "flownet2-kitti": "flownet2",
            "flownet2-sintel": "flownet2",
        }
    )
    for pattern in sorted(table, key=len, reverse=True):
        if pattern in base:
            return table[pattern]
    raise SystemExit(f"cannot infer model from {spec!r}; known: {MODEL_NAMES}")


def load_weights(path: str, model: str):
    import jax

    from flownet2_tpu.inference import MODEL_INITS

    if path == "random":
        return MODEL_INITS[model](jax.random.PRNGKey(0))
    if path.endswith((".caffemodel", ".h5")):
        from flownet2_tpu.models.import_caffe import import_caffemodel

        return import_caffemodel(path, model)
    from flownet2_tpu.checkpoint import load_params

    return load_params(path)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("caffemodel", help="path to weights (.npz/.caffemodel) or 'random'")
    p.add_argument("deployproto", help="model name or deploy template path")
    p.add_argument("img0", help="image 0 path")
    p.add_argument("img1", help="image 1 path")
    p.add_argument("out", help="output .flo filename")
    p.add_argument("--gpu", type=int, default=0, help="device index to use")
    p.add_argument("--verbose", action="store_true", help="keep all logging")
    p.add_argument(
        "--dtype",
        default=None,
        choices=["float32", "bfloat16"],
        help="compute dtype (bfloat16 engages the TPU fast paths)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    for f in (args.caffemodel, args.img0, args.img1):
        if f != "random" and not os.path.exists(f):
            raise SystemExit(f"input does not exist: {f}")

    if not args.verbose:
        # the reference's caffe.set_logging_disabled() analogue
        os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    import jax

    from flownet2_tpu.core.flow_io import read_image, write_flo
    from flownet2_tpu.inference import FlowRunner

    model = resolve_model_name(args.deployproto)
    params = load_weights(args.caffemodel, model)

    devices = jax.devices()
    if args.gpu >= len(devices):
        raise SystemExit(f"device {args.gpu} not available ({len(devices)} present)")
    with jax.default_device(devices[args.gpu]):
        runner = FlowRunner(model, params, dtype=args.dtype)
        img0 = read_image(args.img0)
        img1 = read_image(args.img1)
        print(f"Network forward pass using {args.caffemodel}.")
        flow = runner(img0, img1)
    write_flo(args.out, flow)
    print("Succeeded.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
