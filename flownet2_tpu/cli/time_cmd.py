"""time: forward/backward timing (the ``caffe time`` profiler,
tools/caffe.cpp:302-388).

The reference times each layer's Forward/Backward in a Python-visible loop;
under XLA the program is fused, so per-layer numbers come from three
sources: (1) whole-program forward and forward+backward wall times,
(2) ``--breakdown`` — the per-STAGE cost table (the ``caffe time``
per-layer report at the granularity that exists after fusion: each cascade
stage timed as its own chained program, tools/timing.py methodology),
(3) ``--profile DIR`` writes a jax.profiler trace whose per-op breakdown is
the XLA-native equivalent of per-layer timing (view with TensorBoard or
xprof).
"""

from __future__ import annotations

import argparse
import sys
import time


def _cascade_stages(params, img0, img1, dtype):
    """Stage list for the FlowNet2 cascade breakdown: (name, fn, feedback,
    rest_args). Shapes mirror flownet2_apply's internal wiring
    (models/flownet2.py:101-131)."""
    import jax.numpy as jnp
    import numpy as np

    from flownet2_tpu.models import normalize_images
    from flownet2_tpu.models.flownet_c import flownet_c_apply
    from flownet2_tpu.models.flownet_s import flownet_s_apply
    from flownet2_tpu.models.flownet_sd import flownet_sd_apply
    from flownet2_tpu.models.fusion import fusion_apply
    from flownet2_tpu.ops.channel_norm import channel_norm
    from flownet2_tpu.ops.warp import flow_warp

    n, h, w, _ = img0.shape
    rng = np.random.default_rng(1)
    x0, x1 = normalize_images(img0, img1)
    flow_full = jnp.asarray(rng.uniform(-10, 10, (n, h, w, 2)), dtype)
    stacked12 = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 12)), dtype)
    fused11 = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 11)), dtype)

    return [
        ("normalize_images", lambda a, b: normalize_images(a, b), img0, (img1,)),
        ("flownetc", lambda a, p, b: flownet_c_apply(p, a, b), x0, (params["flownetc"], x1)),
        ("flow_warp (full res)", lambda a, f: flow_warp(a, f), x1, (flow_full,)),
        ("channel_norm", lambda a: channel_norm(a), x0, ()),
        (
            "flownets refinement (xS2)",
            lambda a, p: flownet_s_apply(p, a),
            stacked12,
            (params["flownets_1"],),
        ),
        (
            "flownet-sd branch",
            lambda a, p: flownet_sd_apply(p, jnp.concatenate([a, a], axis=-1)),
            x0,
            (params["flownetsd"],),
        ),
        ("fusion net", lambda a, p: fusion_apply(p, a), fused11, (params["fusion"],)),
    ]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="flownet2")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iterations", type=int, default=20)
    p.add_argument("--backward", action="store_true", help="also time fwd+bwd")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--profile", default=None, help="write a jax.profiler trace here")
    p.add_argument(
        "--breakdown",
        action="store_true",
        help="per-stage cost table for the flownet2 cascade (the caffe time "
        "per-layer report at post-fusion granularity)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from flownet2_tpu.inference import MODEL_INITS, _make_forward
    from flownet2_tpu.train.objectives import LOSSES

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    params = MODEL_INITS[args.model](jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(dtype), params)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (args.batch, args.height, args.width, 3)), dtype)
    img1 = jnp.asarray(rng.uniform(0, 255, (args.batch, args.height, args.width, 3)), dtype)

    fwd = jax.jit(_make_forward(args.model))

    def run_timed(name, fn, *fargs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*fargs))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iterations):
            out = fn(*fargs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iterations * 1000
        print(
            f"{name}: {ms:.3f} ms/iter "
            f"({args.batch / (ms / 1000):.1f} pairs/s, compile {compile_s:.1f}s)"
        )

    run_timed("forward", fwd, params, img0, img1)

    if args.backward and args.model in LOSSES:
        loss_fn = LOSSES[args.model]
        batch = {
            "img0": img0.astype(jnp.float32),
            "img1": img1.astype(jnp.float32),
            "flow": jnp.asarray(
                rng.uniform(-5, 5, (args.batch, args.height, args.width, 2)), jnp.float32
            ),
        }
        grad_fn = jax.jit(jax.grad(lambda p, b: loss_fn(p, b)[0]))
        run_timed("forward+backward", grad_fn, params, batch)

    if args.breakdown:
        from flownet2_tpu.tools.timing import chain_ms

        if args.model != "flownet2":
            print("--breakdown currently tables the flownet2 cascade stages")
        else:
            n1, n2 = (1, 3) if jax.devices()[0].platform == "cpu" else (3, 13)
            print(f"{'stage':<28} {'ms/iter':>9}   note")
            rows = []
            for name, fn, feedback, rest in _cascade_stages(params, img0, img1, dtype):
                ms = chain_ms(fn, feedback, rest, n1, n2)
                rows.append((name, ms))
            notes = {
                "flow_warp (full res)": "x4 in the cascade (S1, S2, fusion prep x2)",
                "flownets refinement (xS2)": "x2 in the cascade (S1 + S2)",
                "channel_norm": "x5 in the cascade",
            }
            for name, ms in rows:
                print(f"{name:<28} {ms:9.3f}   {notes.get(name, '')}")
            total = sum(
                ms * (4 if "warp" in n else 2 if "refinement" in n else 5 if n == "channel_norm" else 1)
                for n, ms in rows
            )
            print(f"{'sum of stages (weighted)':<28} {total:9.3f}   vs whole-program above")

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(fwd(params, img0, img1))
        print(f"profiler trace written to {args.profile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
