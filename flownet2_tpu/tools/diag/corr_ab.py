"""A/B timing of the correlation implementations (MXU banded-matmul vs the
lax.scan displacement loop) at the FlowNetC production shapes.

Backs the DESIGN_NOTES Pallas-correlation post-mortem numbers (the deleted
VPU Mosaic kernel measured 15x slower than the MXU path; the remaining
in-tree implementations are compared here). Reference op:
src/caffe/layers/correlation_layer.cpp/.cu.

Run: python -m flownet2_tpu.tools.diag.corr_ab
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--sizes", default="80x112x256x8,112x256x256x4",
                   help="comma list of HxWxCxB (FlowNetC conv3 geometries)")
    p.add_argument("--n", default="3,13")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.ops.correlation import _make_fast_correlation
    from flownet2_tpu.tools.timing import chain_ms

    on_acc = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_acc else jnp.float32
    n1, n2 = (int(v) for v in args.n.split(","))
    rng = np.random.default_rng(0)

    for size in args.sizes.split(","):
        h, w, c, b = (int(v) for v in size.split("x"))
        fa = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        fb = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
        print(f"== {h}x{w}x{c} b{b} ({dtype.__name__}) ==")
        for impl in ("mxu", "scan"):
            # the FlowNetC config: md=20, k=1, s1=1, s2=2, pad=20
            op = _make_fast_correlation(20, 2, impl)
            fwd = chain_ms(op, fa, (fb,), n1, n2)

            def fwdbwd(a, bq, op=op):
                def loss(a, bq):
                    return jnp.sum(op(a, bq).astype(jnp.float32))

                ga, gb = jax.grad(loss, argnums=(0, 1))(a, bq)
                return ga + gb

            both = chain_ms(fwdbwd, fa, (fb,), n1, n2)
            print(f"  {impl:6s} fwd {fwd:7.2f} ms   fwd+bwd {both:7.2f} ms")


if __name__ == "__main__":
    main()
