"""FlowNet2-SD: the small-displacement FlowNetS variant (FlowNet 2.0, CVPR17).

All-3×3 encoder with an extra stride-1 conv0 and doubled conv*_1 layers, and
a decoder with ``inter_conv`` smoothing layers between deconv and flow
prediction — SURVEY.md §2.6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tpu.models.common import ParamInit, conv_block, deconv_block


def flownet_sd_init(key: jax.Array, in_channels: int = 6, dtype=jnp.float32) -> dict:
    pi = ParamInit(key, dtype)
    pi.conv("conv0", 3, in_channels, 64)
    pi.conv("conv1", 3, 64, 64)
    pi.conv("conv1_1", 3, 64, 128)
    pi.conv("conv2", 3, 128, 128)
    pi.conv("conv2_1", 3, 128, 128)
    pi.conv("conv3", 3, 128, 256)
    pi.conv("conv3_1", 3, 256, 256)
    pi.conv("conv4", 3, 256, 512)
    pi.conv("conv4_1", 3, 512, 512)
    pi.conv("conv5", 3, 512, 512)
    pi.conv("conv5_1", 3, 512, 512)
    pi.conv("conv6", 3, 512, 1024)
    pi.conv("conv6_1", 3, 1024, 1024)

    pi.conv("predict_flow6", 3, 1024, 2)
    # level 5: concat(conv5_1 512, deconv5 512, flow6up 2) = 1026
    pi.deconv("deconv5", 4, 1024, 512)
    pi.deconv("upsample_flow6to5", 4, 2, 2)
    pi.conv("inter_conv5", 3, 1026, 512)
    pi.conv("predict_flow5", 3, 512, 2)
    # level 4: concat(conv4_1 512, deconv4 256, flow5up 2) = 770
    pi.deconv("deconv4", 4, 1026, 256)
    pi.deconv("upsample_flow5to4", 4, 2, 2)
    pi.conv("inter_conv4", 3, 770, 256)
    pi.conv("predict_flow4", 3, 256, 2)
    # level 3: concat(conv3_1 256, deconv3 128, flow4up 2) = 386
    pi.deconv("deconv3", 4, 770, 128)
    pi.deconv("upsample_flow4to3", 4, 2, 2)
    pi.conv("inter_conv3", 3, 386, 128)
    pi.conv("predict_flow3", 3, 128, 2)
    # level 2: concat(conv2_1 128, deconv2 64, flow3up 2) = 194
    pi.deconv("deconv2", 4, 386, 64)
    pi.deconv("upsample_flow3to2", 4, 2, 2)
    pi.conv("inter_conv2", 3, 194, 64)
    pi.conv("predict_flow2", 3, 64, 2)
    return pi.params


def flownet_sd_apply(
    params: dict, x: jnp.ndarray, *, layout: str = "auto"
) -> dict[str, jnp.ndarray]:
    """x: (N, H, W, 6) stacked normalized image pair → {"flow2".."flow6"}.

    ``layout`` "s2d": the full-resolution head (conv0 stride-1 + conv1
    stride-2) runs in the space-to-depth domain without materializing the
    full-res 64-channel activation — the same exact rewrite as the fusion
    net's head (models/fusion.py)."""
    from flownet2_tpu.models.common import use_s2d_head

    if use_s2d_head(x, layout):
        from flownet2_tpu.ops.activations import leaky_relu
        from flownet2_tpu.ops.s2d import conv2d_s2d, space_to_depth

        x2 = space_to_depth(x)
        p0, p1 = params["conv0"], params["conv1"]
        c0_2 = leaky_relu(conv2d_s2d(x2, p0["w"], p0["b"]))
        c1 = leaky_relu(conv2d_s2d(c0_2, p1["w"], p1["b"], stride=2))
    else:
        c0 = conv_block(params, "conv0", x)
        c1 = conv_block(params, "conv1", c0, stride=2)
    c1_1 = conv_block(params, "conv1_1", c1)
    c2 = conv_block(params, "conv2", c1_1, stride=2)
    c2_1 = conv_block(params, "conv2_1", c2)
    c3 = conv_block(params, "conv3", c2_1, stride=2)
    c3_1 = conv_block(params, "conv3_1", c3)
    c4 = conv_block(params, "conv4", c3_1, stride=2)
    c4_1 = conv_block(params, "conv4_1", c4)
    c5 = conv_block(params, "conv5", c4_1, stride=2)
    c5_1 = conv_block(params, "conv5_1", c5)
    c6 = conv_block(params, "conv6", c5_1, stride=2)
    c6_1 = conv_block(params, "conv6_1", c6)

    flows = {}
    flow6 = conv_block(params, "predict_flow6", c6_1, relu=False)
    flows["flow6"] = flow6

    link = c6_1
    skips = {5: c5_1, 4: c4_1, 3: c3_1, 2: c2_1}
    flow = flow6
    for lvl in (5, 4, 3, 2):
        up_feat = deconv_block(params, f"deconv{lvl}", link)
        up_flow = deconv_block(params, f"upsample_flow{lvl + 1}to{lvl}", flow, relu=False)
        link = jnp.concatenate([skips[lvl], up_feat, up_flow], axis=-1)
        inter = conv_block(params, f"inter_conv{lvl}", link, relu=False)
        flow = conv_block(params, f"predict_flow{lvl}", inter, relu=False)
        flows[f"flow{lvl}"] = flow
    return flows
