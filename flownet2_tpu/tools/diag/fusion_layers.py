"""Per-layer timing of the fusion net (the 3-round perf outlier).

The per-STAGE table (cli/time_cmd --breakdown) shows the fusion net at
~11.3 ms of the ~34 ms 448x320 b8 cascade (~8% MFU). This script times
each fusion layer as its own chained program (tools/timing.chain_ms) at
the net's real activation shapes, so the padded-lane floor story can be
checked against per-layer evidence instead of whole-net numbers.

Isolated-sum will not equal in-context cost (XLA fuses across layers),
but it ranks the hogs and exposes any single pathological op.

Run: python -m flownet2_tpu.tools.diag.fusion_layers [--size 320x448x8]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--size", default="320x448x8", help="HxWxB (full-res)")
    p.add_argument("--n", default="3,13")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from flownet2_tpu.models.fusion import fusion_apply, fusion_init
    from flownet2_tpu.ops.conv import conv2d, deconv2d
    from flownet2_tpu.ops.s2d import conv2d_s2d, deconv2d_s2d, space_to_depth
    from flownet2_tpu.tools.timing import chain_ms

    h, w, b = (int(v) for v in args.size.split("x"))
    n1, n2 = (int(v) for v in args.n.split(","))
    on_acc = jax.default_backend() in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_acc else jnp.float32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = fusion_init(key, dtype=dtype)

    def t(name, fn, x_shape, *rest):
        x = jnp.asarray(rng.normal(0, 1, x_shape), dtype)
        ms = chain_ms(fn, x, rest, n1, n2)
        print(f"  {name:22s} in {str(x_shape):22s} {ms:7.3f} ms", flush=True)
        return ms

    h2, w2 = h // 2, w // 2
    h4, w4 = h // 4, w // 4
    p_ = params
    print(f"== fusion layers at {h}x{w} b{b} ({dtype.__name__}) ==", flush=True)
    total = 0.0
    # s2d-domain full-res level (production layout)
    total += t("s2d(input)", lambda x: space_to_depth(x), (b, h, w, 11))
    total += t(
        "conv0 s2d 44->64", lambda x: conv2d_s2d(x, p_["conv0"]["w"], p_["conv0"]["b"]),
        (b, h2, w2, 44),
    )
    total += t(
        "conv1 s2d /2 64->64",
        lambda x: conv2d_s2d(x, p_["conv1"]["w"], p_["conv1"]["b"], stride=2),
        (b, h2, w2, 256),
    )
    total += t(
        "conv1_1 64->128",
        lambda x: conv2d(x, p_["conv1_1"]["w"], p_["conv1_1"]["b"]),
        (b, h2, w2, 64),
    )
    total += t(
        "conv2 /2 128->128",
        lambda x: conv2d(x, p_["conv2"]["w"], p_["conv2"]["b"], stride=2),
        (b, h2, w2, 128),
    )
    total += t(
        "conv2_1 128->128",
        lambda x: conv2d(x, p_["conv2_1"]["w"], p_["conv2_1"]["b"]),
        (b, h4, w4, 128),
    )
    total += t(
        "predict_flow2 128->2",
        lambda x: conv2d(x, p_["predict_flow2"]["w"], p_["predict_flow2"]["b"]),
        (b, h4, w4, 128),
    )
    total += t(
        "deconv1 128->32 up",
        lambda x: deconv2d(x, p_["deconv1"]["w"], p_["deconv1"]["b"]),
        (b, h4, w4, 128),
    )
    total += t(
        "upsample2to1 2->2 up",
        lambda x: deconv2d(x, p_["upsample_flow2to1"]["w"], p_["upsample_flow2to1"]["b"]),
        (b, h4, w4, 2),
    )
    total += t(
        "inter_conv1 162->32",
        lambda x: conv2d(x, p_["inter_conv1"]["w"], p_["inter_conv1"]["b"]),
        (b, h2, w2, 162),
    )
    total += t(
        "predict_flow1 32->2",
        lambda x: conv2d(x, p_["predict_flow1"]["w"], p_["predict_flow1"]["b"]),
        (b, h2, w2, 32),
    )
    total += t(
        "deconv0 s2d 162->16",
        lambda x: deconv2d_s2d(x, p_["deconv0"]["w"], p_["deconv0"]["b"]),
        (b, h2, w2, 162),
    )
    total += t(
        "upsample1to0 s2d 2->2",
        lambda x: deconv2d_s2d(x, p_["upsample_flow1to0"]["w"], p_["upsample_flow1to0"]["b"]),
        (b, h2, w2, 2),
    )
    total += t(
        "inter_conv0 s2d 82->16",
        lambda x: conv2d_s2d(x, p_["inter_conv0"]["w"], p_["inter_conv0"]["b"]),
        (b, h2, w2, 328),
    )
    total += t(
        "predict_flow0 s2d 16->2",
        lambda x: conv2d_s2d(x, p_["predict_flow0"]["w"], p_["predict_flow0"]["b"]),
        (b, h2, w2, 64),
    )
    print(f"  {'SUM (isolated)':22s} {'':22s} {total:7.3f} ms", flush=True)

    x = jnp.asarray(rng.normal(0, 1, (b, h, w, 11)), dtype)
    ms = chain_ms(lambda a: fusion_apply(params, a)["flow0"], x, (), n1, n2)
    print(f"  {'whole net (s2d auto)':22s} {'':22s} {ms:7.3f} ms", flush=True)
    ms = chain_ms(
        lambda a: fusion_apply(params, a, layout="plain")["flow0"], x, (), n1, n2
    )
    print(f"  {'whole net (plain)':22s} {'':22s} {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
