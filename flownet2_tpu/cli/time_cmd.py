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
        from flownet2_tpu.tools.breakdown import (
            params_for_stages,
            time_stages,
            walk_stages,
        )

        n1, n2 = (1, 3) if jax.devices()[0].platform == "cpu" else (3, 13)
        stages = walk_stages(args.model, params, img0, img1)
        time_stages(
            stages,
            params_for_stages(args.model, params),
            n1=n1,
            n2=n2,
            backward=args.backward,
        )
        shape_of = lambda st: "x".join(
            str(d)
            for s in st.arg_specs
            if isinstance(s, jax.ShapeDtypeStruct)
            for d in s.shape[1:3]
        )[:9]
        hdr = f"{'stage':<20} {'shape':>11} {'count':>5} {'fwd ms':>9}"
        if args.backward:
            hdr += f" {'bwd ms':>9} {'f+b ms':>9}"
        print(hdr)
        fwd_total = fb_total = 0.0
        for st in stages:
            row = f"{st.name:<20} {shape_of(st):>11} {st.count:>5} {st.fwd_ms:>9.3f}"
            fwd_total += st.count * st.fwd_ms
            if args.backward:
                row += f" {st.bwd_ms:>9.3f} {st.fwdbwd_ms:>9.3f}"
                if st.fwdbwd_ms == st.fwdbwd_ms:  # not NaN
                    fb_total += st.count * st.fwdbwd_ms
            print(row)
        # count-weighted sums cross-check the whole-program numbers above
        total_row = f"{'sum (count-weighted)':<20} {'':>11} {'':>5} {fwd_total:>9.3f}"
        if args.backward:
            total_row += f" {'':>9} {fb_total:>9.3f}"
        print(total_row + "   vs whole-program above")

    if args.profile:
        with jax.profiler.trace(args.profile):
            jax.block_until_ready(fwd(params, img0, img1))
        print(f"profiler trace written to {args.profile}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
