"""FlowNetS: the simple encoder-decoder flow net (FlowNet, ICCV 2015).

9-conv encoder (7×7/5×5 stride-2 head down to stride 64) + refinement
decoder with per-scale flow predictions — SURVEY.md §2.6. Used standalone
and (with 12-channel inputs) as the S1/S2 stages of the FlowNet2 cascade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tpu.models.common import (
    ParamInit,
    conv_block,
    init_refinement_decoder,
    refinement_decoder,
    strided_head_block,
)

ENCODER_CHANNELS = {
    "conv1": (7, 64, 2),
    "conv2": (5, 128, 2),
    "conv3": (5, 256, 2),
    "conv3_1": (3, 256, 1),
    "conv4": (3, 512, 2),
    "conv4_1": (3, 512, 1),
    "conv5": (3, 512, 2),
    "conv5_1": (3, 512, 1),
    "conv6": (3, 1024, 2),
    "conv6_1": (3, 1024, 1),
}


def flownet_s_init(key: jax.Array, in_channels: int = 6, dtype=jnp.float32) -> dict:
    pi = ParamInit(key, dtype)
    cin = in_channels
    for name, (k, cout, _stride) in ENCODER_CHANNELS.items():
        pi.conv(name, k, cin, cout)
        cin = cout
    init_refinement_decoder(
        pi, feature_channels={6: 1024, 5: 512, 4: 512, 3: 256, 2: 128}
    )
    return pi.params


def flownet_s_apply(
    params: dict, x: jnp.ndarray, *, layout: str = "auto"
) -> dict[str, jnp.ndarray]:
    """x: (N, H, W, C) stacked inputs → {"flow2".."flow6"} (net units).

    ``layout``: "s2d" evaluates the full-res 7×7/s2 head in the
    space-to-depth domain (exact; the TPU fast path), "plain" the direct
    conv; "auto" picks per backend (models/common.use_s2d_head)."""
    c1 = strided_head_block(params, "conv1", x, layout=layout)
    c2 = conv_block(params, "conv2", c1, stride=2)
    c3 = conv_block(params, "conv3", c2, stride=2)
    c3_1 = conv_block(params, "conv3_1", c3)
    c4 = conv_block(params, "conv4", c3_1, stride=2)
    c4_1 = conv_block(params, "conv4_1", c4)
    c5 = conv_block(params, "conv5", c4_1, stride=2)
    c5_1 = conv_block(params, "conv5_1", c5)
    c6 = conv_block(params, "conv6", c5_1, stride=2)
    c6_1 = conv_block(params, "conv6_1", c6)
    return refinement_decoder(
        params, {6: c6_1, 5: c5_1, 4: c4_1, 3: c3_1, 2: c2}
    )
