"""A/B timing of the flow_warp implementations, forward and fwd+bwd.

The production fast path is the fused Pallas kernel (ops/pallas/warp.py);
this script pits it against the windowed-XLA, one-hot, and gather
formulations at the two benchmark geometries so routing decisions stay
evidence-based (VERDICT r3/r4: the r3 warp rework shipped unvalidated).

Run: python -m flownet2_tpu.tools.diag.warp_ab [--sizes 320x448x8,448x1024x4]
Methodology: tools/timing.chain_ms (data-dependent fori_loop chains — naive
loops report fantasy numbers through the tunnel).
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--sizes", default="320x448x8,448x1024x4",
                   help="comma list of HxWxB")
    p.add_argument("--methods", default=None,
                   help="comma list (default: pallas,windowed,onehot on TPU; "
                        "windowed,gather on CPU)")
    p.add_argument("--n", default="3,13", help="n1,n2 chain lengths")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.ops.warp import flow_warp
    from flownet2_tpu.tools.timing import chain_ms

    on_acc = jax.default_backend() in ("tpu", "axon")
    methods = (
        args.methods.split(",") if args.methods
        else (["pallas", "windowed", "onehot"] if on_acc else ["windowed", "gather"])
    )
    n1, n2 = (int(v) for v in args.n.split(","))
    dtype = jnp.bfloat16 if on_acc else jnp.float32

    rng = np.random.default_rng(0)
    for size in args.sizes.split(","):
        h, w, b = (int(v) for v in size.split("x"))
        img = jnp.asarray(rng.uniform(0, 255, (b, h, w, 3)), dtype)
        flow = jnp.asarray(rng.normal(0, 8, (b, h, w, 2)), jnp.float32)
        print(f"== {h}x{w} b{b} ({dtype.__name__}) ==")
        for m in methods:
            fwd = chain_ms(
                lambda i, f, m=m: flow_warp(i, f, method=m), img, (flow,), n1, n2
            )

            def fwdbwd(i, f, m=m):
                def loss(i, f):
                    return jnp.sum(flow_warp(i, f, method=m).astype(jnp.float32))

                gi, gf = jax.grad(loss, argnums=(0, 1))(i, f)
                return gi.astype(jnp.float32) + 0 * jnp.sum(gf)

            both = chain_ms(fwdbwd, img, (flow,), n1, n2)
            print(f"  {m:10s} fwd {fwd:7.2f} ms   fwd+bwd {both:7.2f} ms")


if __name__ == "__main__":
    main()
