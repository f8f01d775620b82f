"""Repro: closing over data in a jitted fn miscomputes through the remote
compile path (axon).

Backs the DESIGN_NOTES "never bake arrays into a program" rule: a
jit(epe ∘ cascade) that closes over the batch (baking images in as HLO
constants) returned EPE 5.29 where the identical computation with the
batch passed as ARGUMENTS returns 0.51 (same params, same batch, v5e via
axon). On a local backend both paths agree — run this on the tunnel to
check whether the stack still exhibits the divergence.

Run: python -m flownet2_tpu.tools.diag.jit_closure_repro [--weights W.npz]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--weights", default="random")
    p.add_argument("--size", default="320x448")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models import flownet2_apply, flownet2_init
    from flownet2_tpu.tools.synth_dataset import make_sample

    h, w = (int(v) for v in args.size.split("x"))
    rng = np.random.default_rng(0)
    s = [make_sample(rng, h, w) for _ in range(2)]
    img0 = jnp.asarray(np.stack([x[0] for x in s]), jnp.float32)
    img1 = jnp.asarray(np.stack([x[1] for x in s]), jnp.float32)
    flow = jnp.asarray(np.stack([x[2] for x in s]))

    if args.weights == "random":
        params = flownet2_init(jax.random.PRNGKey(0))
    else:
        from flownet2_tpu.checkpoint import load_params

        params = load_params(args.weights)

    def epe(pred, gt):
        return jnp.sqrt(jnp.sum((pred - gt) ** 2, -1)).mean()

    # GOOD: every array is an argument
    as_args = float(
        jax.jit(lambda p, a, b, f: epe(flownet2_apply(p, a, b), f))(
            params, img0, img1, flow
        )
    )
    # BAD: batch baked in as constants (params still passed — constants-
    # heavy params overflow the remote compile service with HTTP 413)
    as_consts = float(jax.jit(lambda p: epe(flownet2_apply(p, img0, img1), flow))(params))

    print(f"batch as arguments: EPE {as_args:.4f}")
    print(f"batch as constants: EPE {as_consts:.4f}")
    if abs(as_args - as_consts) > 1e-2:
        print("DIVERGENT — the compile path miscomputes constants-heavy "
              "programs; keep every array an argument")
    else:
        print("consistent on this backend")


if __name__ == "__main__":
    main()
