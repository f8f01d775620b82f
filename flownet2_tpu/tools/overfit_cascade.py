"""Stage-wise FlowNet2 cascade training to convergence, offline.

The reference's entire purpose is training the stacked nets stage by stage
(README.md:100-106 recipe; solver.cpp:194-324 loop): FlowNetC first, then
each S refinement with the upstream frozen, then SD, then the fusion net.
This tool runs that recipe end to end on the 8 reference FlyingChairs
example pairs (the only ground-truth data in the tree,
data/FlyingChairs_examples/) and produces a full FlowNet2 checkpoint whose
cascade EPE is far below random init — the strongest full-system training
proof available without network access (VERDICT r2 next.3):

- C-stage exercises the MXU selmm correlation VJP over thousands of steps;
- S1/S2 stages exercise the windowed-warp VJP (frozen upstream,
  train/objectives.make_cascade_stage_loss);
- SD-stage the space-to-depth net; fusion the full frozen cascade forward.

Logs per stage in the reference solver format (tools/parse_log.py
consumes them) and writes the final cascade params as an .npz.

Usage:
  python -m flownet2_tpu.tools.overfit_cascade --iters 800 --out runs/cascade
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


STAGES = ("c", "s1", "s2", "sd", "fusion")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/root/reference/data/FlyingChairs_examples")
    p.add_argument("--iters", type=int, default=800, help="iterations per stage")
    p.add_argument("--chunk", type=int, default=50, help="device steps per host loop")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--out", default="runs/cascade", help="output dir (logs + checkpoint)")
    p.add_argument(
        "--stages", default=",".join(STAGES),
        help="comma-separated subset of c,s1,s2,sd,fusion",
    )
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype (bfloat16 = mixed precision, f32 master params)",
    )
    p.add_argument(
        "--init-from", default=None, metavar="NPZ",
        help="start from a saved flownet2_staged.npz instead of random init "
        "(stage-by-stage experiments without retraining the upstream)",
    )
    p.add_argument(
        "--reinit", default="", metavar="STAGES",
        help="comma list of stages whose subtree is re-randomized after "
        "--init-from (e.g. --reinit fusion to train fusion from scratch on "
        "a trained upstream)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    from flownet2_tpu.models import flownet2_apply, flownet2_init
    from flownet2_tpu.ops.losses import epe
    from flownet2_tpu.tools.overfit import load_examples
    from flownet2_tpu.train.objectives import (
        STAGE_SUBTREE,
        make_split_stage_loss,
        split_stage_params,
        with_compute_dtype,
    )

    os.makedirs(args.out, exist_ok=True)
    img0, img1, flow = load_examples(args.data, (args.height, args.width))
    batch = {
        "img0": jnp.asarray(img0),
        "img1": jnp.asarray(img1),
        "flow": jnp.asarray(flow),
    }

    params = flownet2_init(jax.random.PRNGKey(0))
    if args.init_from:
        loaded = dict(np.load(args.init_from))

        def unflatten(tmpl, prefix=""):
            return {
                k: unflatten(v, f"{prefix}{k}/")
                if isinstance(v, dict)
                else jnp.asarray(loaded[prefix + k])
                for k, v in tmpl.items()
            }

        fresh = params
        params = unflatten(params)
        for stage in [s for s in args.reinit.split(",") if s]:
            sub = STAGE_SUBTREE[stage]
            params[sub] = fresh[sub]
            print(f"re-randomized subtree {sub}", flush=True)

    # batch MUST be an argument, not a closure: baking the images into the
    # jitted program as constants produces WRONG numerics through the axon
    # compile path (measured: 5.29 vs the correct 0.51 EPE on the same
    # params/batch — scratch/diag_epe_jit.py repro; same class of issue as
    # the close-over-params HTTP 413 in .claude/skills/verify/SKILL.md).
    _cascade_epe = jax.jit(
        lambda p, b: epe(flownet2_apply(p, b["img0"], b["img1"]), b["flow"])
    )

    def cascade_epe(p):
        return _cascade_epe(p, batch)

    init_epe = float(cascade_epe(params))
    print(f"cascade EPE at random init: {init_epe:.4f}", flush=True)
    results = {"init_epe": init_epe, "stages": {}}

    # Split-stage formulation (objectives.make_split_stage_loss): the
    # optimizer/gradients cover ONLY the trainable subtree; frozen upstream
    # subtrees ride the batch. The full-pytree variant materializes
    # zero-gradient + update trees for the frozen ~120M params — enough to
    # tip the fusion stage over HBM (measured: 15.75G used, 6.16M over).
    for stage in args.stages.split(","):
        loss_fn = make_split_stage_loss(stage)
        if args.dtype == "bfloat16":
            loss_fn = with_compute_dtype(loss_fn, jnp.bfloat16)
        sub = STAGE_SUBTREE[stage]
        trainable, frozen = split_stage_params(params, stage)
        stage_batch = dict(batch, frozen=frozen)
        lr = optax.cosine_decay_schedule(args.lr, args.iters)
        # eps=1e-12: per-pixel-normalized objectives (the fusion stage
        # trains at mean-EPE scale) shrink gradient magnitudes ~1e5× vs the
        # pixel-sum convention; a small eps keeps Adam's scale invariance
        # intact for any such loss (measured neutral on the current stages —
        # fusion EPE identical at 1e-8 vs 1e-12 — this is safety margin,
        # not a tuned knob).
        tx = optax.adam(lr, eps=1e-12)
        opt_state = tx.init(trainable)

        def step(tparams, opt_state, batch):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(tparams, batch)
            updates, opt_state = tx.update(grads, opt_state, tparams)
            return optax.apply_updates(tparams, updates), opt_state, loss

        @jax.jit
        def run_chunk(tparams, opt_state, batch, n):
            def body(i, carry):
                tparams, opt_state, _ = carry
                tparams, opt_state, loss = step(tparams, opt_state, batch)
                return tparams, opt_state, loss

            return lax.fori_loop(0, n, body, (tparams, opt_state, jnp.float32(0)))

        lines = []

        def log(msg):
            print(msg, flush=True)
            lines.append(msg)

        it, t0 = 0, time.time()
        log(f"[{stage}] training {sub} for {args.iters} iters")
        first_loss = None
        while it < args.iters:
            n = min(args.chunk, args.iters - it)
            trainable, opt_state, loss = run_chunk(trainable, opt_state, stage_batch, n)
            loss = float(loss)
            first_loss = loss if first_loss is None else first_loss
            it += n
            rate = n / max(time.time() - t0, 1e-9)
            t0 = time.time()
            log(f"Iteration {it}, loss = {loss:.6f} ({rate:.2f} iter/s)")
        params = dict(params)
        params[sub] = jax.tree.map(lambda x: x, trainable)
        stage_epe = float(cascade_epe(params))
        log(f"[{stage}] done: loss {first_loss:.4f} -> {loss:.4f}; cascade EPE {stage_epe:.4f}")
        results["stages"][stage] = {
            "first_loss": first_loss,
            "final_loss": loss,
            "cascade_epe": stage_epe,
        }
        with open(os.path.join(args.out, f"log_{stage}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")

    final_epe = float(cascade_epe(params))
    results["final_epe"] = final_epe
    print(
        f"cascade EPE: {init_epe:.4f} (random init) -> {final_epe:.4f} "
        f"after staged training",
        flush=True,
    )

    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(getattr(k, "key", str(k)) for k in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(args.out, "flownet2_staged.npz"), **flat)
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"checkpoint + logs written under {args.out}", flush=True)
    return 0 if final_epe < init_epe * 0.5 else 1


if __name__ == "__main__":
    sys.exit(main())
