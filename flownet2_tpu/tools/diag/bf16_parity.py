"""bf16-vs-f32 inference divergence on TRAINED weights.

Backs the DESIGN_NOTES "bf16 inference parity" numbers: on the staged-
cascade checkpoint the production bf16 config (bf16 weights/activations +
the windowed/Pallas warp fast paths) costs +0.021 px GT-EPE over f32
(0.508 -> 0.529) with mean flow divergence 0.079 px. Divergence under
RANDOM weights is large/chaotic and is NOT evidence — always point this at
a trained checkpoint.

Run: python -m flownet2_tpu.tools.diag.bf16_parity \
    --weights runs/cascade/flownet2_staged.npz --pairs runs/cascade/pairs.npz
(or --synth to score against freshly generated synthetic pairs).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights", required=True, help=".npz params (trained)")
    p.add_argument("--model", default="flownet2")
    p.add_argument("--pairs", help=".npz with img0/img1/flow arrays")
    p.add_argument("--synth", action="store_true",
                   help="score on 8 generated synthetic pairs instead")
    p.add_argument("--size", default="320x448")
    args = p.parse_args(argv)

    from flownet2_tpu.checkpoint import load_params
    from flownet2_tpu.inference import FlowRunner

    if args.pairs:
        d = np.load(args.pairs)
        img0, img1, flow = d["img0"], d["img1"], d["flow"]
    elif args.synth:
        from flownet2_tpu.tools.synth_dataset import make_sample

        h, w = (int(v) for v in args.size.split("x"))
        rng = np.random.default_rng(0)
        samples = [make_sample(rng, h, w) for _ in range(8)]
        img0 = np.stack([s[0] for s in samples]).astype(np.float32)
        img1 = np.stack([s[1] for s in samples]).astype(np.float32)
        flow = np.stack([s[2] for s in samples])
    else:
        p.error("need --pairs or --synth")

    params = load_params(args.weights)

    def score(dtype):
        runner = FlowRunner(args.model, params, dtype=dtype)
        pred = runner.batch(img0, img1)
        epe = float(np.sqrt(((pred - flow) ** 2).sum(-1)).mean())
        return pred, epe

    pred32, epe32 = score(None)
    pred16, epe16 = score("bfloat16")
    div = np.sqrt(((pred16 - pred32) ** 2).sum(-1))
    print(f"f32  GT-EPE: {epe32:.4f}")
    print(f"bf16 GT-EPE: {epe16:.4f}   (delta {epe16 - epe32:+.4f})")
    print(f"bf16-vs-f32 flow divergence: mean {div.mean():.4f} px, "
          f"max {div.max():.2f} px")


if __name__ == "__main__":
    main()
