"""Convergence validation: overfit FlowNetS on the 8 reference FlyingChairs
example pairs (data/FlyingChairs_examples/) and drive EPE to near zero.

The reference validated its update numerics with multi-iteration solver
tests (test_gradient_based_solver.cpp); this is the framework-level
equivalent at real scale: thousands of real optimizer steps through the
full conv stack, multi-scale EPE supervision, LR schedule and the EPE
metric — demonstrating the solver stack actually optimizes, far beyond a
12-iteration smoke test.

Runs the whole loop ON DEVICE: the 8 pairs are resident, and a
lax.fori_loop executes `chunk` train steps per host round-trip (no input
pipeline — overfitting wants the same batch every step). Logs in the
reference solver format so tools/parse_log.py and plot_training_log
consume it directly.

Usage: python -m flownet2_tpu.tools.overfit --iters 2000 --log out/log.txt
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def load_examples(root: str, size=(320, 448)):
    import numpy as np

    from flownet2_tpu.core.flow_io import read_flo, read_image
    from flownet2_tpu.ops.resample import resample
    import jax.numpy as jnp

    pairs = sorted(glob.glob(os.path.join(root, "*-img0.ppm")))
    if not pairs:
        raise FileNotFoundError(f"no *-img0.ppm under {root}")
    img0s, img1s, flows = [], [], []
    for p0 in pairs:
        base = p0[: -len("-img0.ppm")]
        img0s.append(read_image(p0).astype(np.float32))
        img1s.append(read_image(base + "-img1.ppm").astype(np.float32))
        flows.append(read_flo(base + "-gt.flo").astype(np.float32))
    img0 = np.stack(img0s)
    img1 = np.stack(img1s)
    flow = np.stack(flows)
    h, w = size
    if (img0.shape[1], img0.shape[2]) != (h, w):
        # FlyingChairs is 384x512; train at the reference crop 320x448 by
        # bilinear resize + flow rescale (cheaper than crop plumbing here,
        # and overfitting doesn't care about augmentation fidelity).
        sy, sx = h / img0.shape[1], w / img0.shape[2]
        img0 = np.asarray(resample(jnp.asarray(img0), h, w, method="linear"))
        img1 = np.asarray(resample(jnp.asarray(img1), h, w, method="linear"))
        flow = np.asarray(resample(jnp.asarray(flow), h, w, method="linear"))
        flow = flow * np.asarray([sx, sy], np.float32)
    return img0, img1, flow


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/root/reference/data/FlyingChairs_examples")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--chunk", type=int, default=50, help="device steps per host loop")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument(
        "--cosine", action="store_true",
        help="cosine-decay the LR to 0 over --iters (constant LR plateaus "
        "around EPE ~0.65 on the 8-pair set; decay drives it below 0.5)",
    )
    p.add_argument("--log", default=None, help="write the solver-format log here")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=448)
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype: bfloat16 = mixed precision (bf16 activations + "
        "cast weights, f32 master params/optimizer — "
        "train.objectives.with_compute_dtype)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    from flownet2_tpu.models import flownet_s_init
    from flownet2_tpu.ops.losses import epe
    from flownet2_tpu.train.objectives import flownet_s_loss, with_compute_dtype
    from flownet2_tpu.inference import FlowRunner

    img0, img1, flow = load_examples(args.data, (args.height, args.width))
    batch = {
        "img0": jnp.asarray(img0),
        "img1": jnp.asarray(img1),
        "flow": jnp.asarray(flow),
    }

    params = flownet_s_init(jax.random.PRNGKey(0))
    # Adam overfits far faster than the reference's SGD schedule; the point
    # here is validating the training stack drives EPE down, not replaying
    # the 1.2M-iteration S_long recipe.
    lr = optax.cosine_decay_schedule(args.lr, args.iters) if args.cosine else args.lr
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    loss_fn = flownet_s_loss
    if args.dtype == "bfloat16":
        loss_fn = with_compute_dtype(flownet_s_loss, jnp.bfloat16)

    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def run_chunk(params, opt_state, batch, n):
        def body(i, carry):
            params, opt_state, _ = carry
            params, opt_state, loss = step(params, opt_state, batch)
            return params, opt_state, loss

        return lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    runner = FlowRunner("flownets", params=params)

    def current_epe(params):
        runner.params = params
        pred = runner.batch(np.asarray(batch["img0"]), np.asarray(batch["img1"]))
        return float(epe(jnp.asarray(pred), batch["flow"]))

    # EPE at the supervised resolution: FlowNetS predicts at 1/4 res and the
    # deploy path upsamples x4 bilinearly, which imposes a ~0.6px full-res
    # EPE floor on this set regardless of fit quality (high-frequency flow
    # the net cannot emit). The quarter-res EPE against the NaN-aware
    # downsampled GT — the quantity training actually optimizes — is the
    # honest convergence metric.
    # batch is an ARGUMENT, not a closure: constants baked into the jitted
    # program miscompute through the axon compile path (see
    # tools/overfit_cascade.py's cascade_epe note + scratch/diag_epe_jit.py).
    @jax.jit
    def _native_epe(params, batch):
        from flownet2_tpu.models import normalize_images
        from flownet2_tpu.models.flownet_s import flownet_s_apply
        from flownet2_tpu.ops.downsample import downsample_nan_aware
        from flownet2_tpu.train.objectives import DIV_FLOW

        x0, x1 = normalize_images(batch["img0"], batch["img1"])
        flows = flownet_s_apply(params, jnp.concatenate([x0, x1], axis=-1))
        f2 = flows["flow2"] * DIV_FLOW
        gt = downsample_nan_aware(batch["flow"], f2.shape[1], f2.shape[2])
        return epe(f2, gt)

    def native_epe(params):
        return _native_epe(params, batch)

    lines = []

    def log(msg):
        print(msg, flush=True)
        lines.append(msg)

    it = 0
    t0 = time.time()
    log(f"Iteration {it}, test metric = {current_epe(params):.6f}")
    while it < args.iters:
        n = min(args.chunk, args.iters - it)
        params, opt_state, loss = run_chunk(params, opt_state, batch, n)
        loss = float(loss)
        it += n
        rate = n / max(time.time() - t0, 1e-9)
        t0 = time.time()
        log(f"Iteration {it}, loss = {loss:.6f} ({rate:.2f} iter/s)")
        if it % (args.chunk * 8) == 0 or it >= args.iters:
            log(f"Iteration {it}, test metric = {current_epe(params):.6f}")

    final = current_epe(params)
    final_native = float(native_epe(params))
    log(f"final EPE over the 8 training pairs: {final:.4f} (full res, "
        f"x4-upsample floor ~0.6); {final_native:.4f} at the supervised 1/4 res")
    if args.log:
        os.makedirs(os.path.dirname(args.log) or ".", exist_ok=True)
        with open(args.log, "w") as f:
            f.write("\n".join(lines) + "\n")
    return 0 if final_native < 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
