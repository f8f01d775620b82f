#!/usr/bin/env python
"""Headline benchmark: FlowNet2 full-cascade inference throughput.

Measures image-pairs/sec at 448x320 (the FlyingChairs training resolution,
reference README.md:100-106) on the available accelerator, and compares
against the reference's paper-sourced FlowNet2 runtime of ~123 ms/pair on a
GTX 1080 (BASELINE.md) => ~8.13 pairs/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_PAIRS_PER_SEC = 1000.0 / 123.0  # GTX 1080, FlowNet2 paper (BASELINE.md)
H, W = 320, 448


def main():
    from flownet2_tpu.models import flownet2_apply, flownet2_init

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 8 if on_tpu else 1
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    params = flownet2_init(jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 255, (batch, H, W, 3)), dtype)
    img1 = jnp.asarray(rng.uniform(0, 255, (batch, H, W, 3)), dtype)

    fwd = jax.jit(flownet2_apply)
    # warmup / compile
    jax.block_until_ready(fwd(params, img0, img1))

    n_iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, img0, img1)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = n_iters * batch / dt
    print(
        json.dumps(
            {
                "metric": "flownet2_448x320_pairs_per_sec",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / REF_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
