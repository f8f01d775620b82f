"""FlowNetFusion: the small full-resolution net that fuses the CSS (large
displacement) and SD (small displacement) flows into the final FlowNet2
output — SURVEY.md §2.6.

Input (11 channels): img0 (3) + sd_flow (2) + css_flow (2) + their channel
norms (1+1) + the two brightness-error magnitudes (1+1). Operates at full
resolution with only two downsamplings; predict_flow0 is the final flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tpu.models.common import ParamInit, conv_block, deconv_block
from flownet2_tpu.ops.activations import leaky_relu
from flownet2_tpu.ops.s2d import (
    _pallas_ok,
    conv2d_s2d,
    deconv2d_s2d,
    depth_to_space,
    space_to_depth,
)


def fusion_init(key: jax.Array, in_channels: int = 11, dtype=jnp.float32) -> dict:
    pi = ParamInit(key, dtype)
    pi.conv("conv0", 3, in_channels, 64)
    pi.conv("conv1", 3, 64, 64)
    pi.conv("conv1_1", 3, 64, 128)
    pi.conv("conv2", 3, 128, 128)
    pi.conv("conv2_1", 3, 128, 128)

    pi.conv("predict_flow2", 3, 128, 2)
    # level 1: concat(conv1_1 128, deconv1 32, flow2up 2) = 162
    pi.deconv("deconv1", 4, 128, 32)
    pi.deconv("upsample_flow2to1", 4, 2, 2)
    pi.conv("inter_conv1", 3, 162, 32)
    pi.conv("predict_flow1", 3, 32, 2)
    # level 0: concat(conv0 64, deconv0 16, flow1up 2) = 82
    pi.deconv("deconv0", 4, 162, 16)
    pi.deconv("upsample_flow1to0", 4, 2, 2)
    pi.conv("inter_conv0", 3, 82, 16)
    pi.conv("predict_flow0", 3, 16, 2)
    return pi.params


def fusion_apply(
    params: dict, x: jnp.ndarray, *, layout: str = "auto"
) -> dict[str, jnp.ndarray]:
    """x: (N, H, W, 11) → {"flow0", "flow1", "flow2"}; flow0 is final.

    layout="s2d" evaluates the full-resolution head in the space-to-depth
    domain (ops/s2d.py) — an exact rewrite of the full-res low-channel
    convs, the cascade's slowest op class under XLA's native lowering.
    Round-3 note: net-in-ISOLATION plain beats s2d at 448 wide (11.2 vs
    13.0 ms b8 bf16 v5e) but IN-CASCADE s2d still wins there (32.8 vs
    33.8 ms full flownet2) and wins big at Sintel width (23.0 vs 35.7
    isolated) — so auto stays s2d everywhere on accelerators
    (scratch/cascade_ab_r3.py). "auto" picks s2d on accelerators when
    H, W are even; "plain" is the oracle path.
    """
    if layout == "auto":
        layout = (
            "s2d"
            if jax.default_backend() != "cpu" and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            else "plain"
        )
    if layout == "s2d":
        return _fusion_apply_s2d(params, x)
    c0 = conv_block(params, "conv0", x)
    c1 = conv_block(params, "conv1", c0, stride=2)
    c1_1 = conv_block(params, "conv1_1", c1)
    c2 = conv_block(params, "conv2", c1_1, stride=2)
    c2_1 = conv_block(params, "conv2_1", c2)

    flows = {}
    flow2 = conv_block(params, "predict_flow2", c2_1, relu=False)
    flows["flow2"] = flow2

    up_feat1 = deconv_block(params, "deconv1", c2_1)
    up_flow1 = deconv_block(params, "upsample_flow2to1", flow2, relu=False)
    concat1 = jnp.concatenate([c1_1, up_feat1, up_flow1], axis=-1)
    inter1 = conv_block(params, "inter_conv1", concat1, relu=False)
    flow1 = conv_block(params, "predict_flow1", inter1, relu=False)
    flows["flow1"] = flow1

    up_feat0 = deconv_block(params, "deconv0", concat1)
    up_flow0 = deconv_block(params, "upsample_flow1to0", flow1, relu=False)
    concat0 = jnp.concatenate([c0, up_feat0, up_flow0], axis=-1)
    inter0 = conv_block(params, "inter_conv0", concat0, relu=False)
    flow0 = conv_block(params, "predict_flow0", inter0, relu=False)
    flows["flow0"] = flow0
    return flows


def _fusion_apply_s2d(params: dict, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Fusion net with the full-resolution levels in the s2d domain.

    conv0 and the whole level-0 head (deconv0, upsample_flow1to0,
    inter_conv0, predict_flow0) never materialize full-res activations:
    s2d once at the input, depth_to_space once on the final 2-channel flow.
    Levels 1-2 (half/quarter res) keep the plain path. Exactness is tested
    against fusion_apply(layout="plain") in tests/test_models.py.
    """
    x2 = space_to_depth(x)
    p = params
    c0_2 = leaky_relu(conv2d_s2d(x2, p["conv0"]["w"], p["conv0"]["b"]))
    c1 = leaky_relu(conv2d_s2d(c0_2, p["conv1"]["w"], p["conv1"]["b"], stride=2))
    c1_1 = conv_block(p, "conv1_1", c1)
    c2 = conv_block(p, "conv2", c1_1, stride=2)
    c2_1 = conv_block(p, "conv2_1", c2)

    flows = {}
    flow2 = conv_block(p, "predict_flow2", c2_1, relu=False)
    flows["flow2"] = flow2

    up_feat1 = deconv_block(p, "deconv1", c2_1)
    up_flow1 = deconv_block(p, "upsample_flow2to1", flow2, relu=False)

    from flownet2_tpu.ops.s2d import fusion_head, fusion_head_ok

    if fusion_head_ok(c0_2.shape[2]):
        # Fused Pallas decoder head (ops/pallas/fusion_head.py): the five
        # remaining layers in ONE kernel — intermediates never leave VMEM,
        # killing the XLA layout copies + s2d phase repacks the round-5
        # trace breakdown attributed to this region. concat1 is built
        # 256-channel directly (the kernel's lane-aligned DMA shape) so no
        # separate pad copy materializes.
        concat1p = jnp.concatenate(
            [
                c1_1, up_feat1, up_flow1,
                jnp.zeros(c1_1.shape[:3] + (94,), c1_1.dtype),
            ],
            axis=-1,
        )
        flow0_2, flow1 = fusion_head(concat1p, c0_2, p)
        flows["flow1"] = flow1
        flows["flow0"] = depth_to_space(flow0_2)
        return flows

    concat1 = jnp.concatenate([c1_1, up_feat1, up_flow1], axis=-1)
    inter1 = conv_block(p, "inter_conv1", concat1, relu=False)
    flow1 = conv_block(p, "predict_flow1", inter1, relu=False)
    flows["flow1"] = flow1

    up_feat0_2 = leaky_relu(deconv2d_s2d(concat1, p["deconv0"]["w"], p["deconv0"]["b"]))
    up_flow0_2 = deconv2d_s2d(flow1, p["upsample_flow1to0"]["w"], p["upsample_flow1to0"]["b"])
    w_ic0, b_ic0 = p["inter_conv0"]["w"], p["inter_conv0"]["b"]
    if not _pallas_ok(c0_2.shape[2]):
        # Narrow widths (XLA conv routing): split-sum the inter_conv0 over
        # its three sources instead of materializing the 328-channel concat
        # — exact (sum of convs == conv of concat) and measured 11.2 vs
        # 13.0 ms whole-net at 448×320 b8. At Pallas-routed widths the
        # merged segments conv wins (23.0 vs 28.3 ms at 1024-wide Sintel,
        # scratch/fusion_variants_r3.py), so this is width-conditional.
        inter0_2 = (
            conv2d_s2d(c0_2, w_ic0[:, :, :64, :], b_ic0)
            + conv2d_s2d(up_feat0_2, w_ic0[:, :, 64:80, :], None)
            + conv2d_s2d(up_flow0_2, w_ic0[:, :, 80:, :], None)
        )
    else:
        concat0_2 = jnp.concatenate([c0_2, up_feat0_2, up_flow0_2], axis=-1)
        inter0_2 = conv2d_s2d(concat0_2, w_ic0, b_ic0, segments=(64, 16, 2))
    flow0_2 = conv2d_s2d(inter0_2, p["predict_flow0"]["w"], p["predict_flow0"]["b"])
    flows["flow0"] = depth_to_space(flow0_2)
    return flows
