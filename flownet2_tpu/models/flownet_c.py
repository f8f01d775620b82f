"""FlowNetC: siamese feature towers + correlation cost volume.

conv1-3 applied to each image with shared weights, then
Correlation(max_displacement=20, stride2=2, pad=20 → 441 channels) at the
conv3 resolution (stride 8), a 1×1 conv_redir branch (32ch) on the img0
tower, and the FlowNetS decoder on the concatenated 473 channels —
SURVEY.md §2.6.
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
from flownet2_tpu.ops.activations import leaky_relu
from flownet2_tpu.ops.correlation import correlation_auto as correlation

CORR_KWARGS = dict(max_displacement=20, kernel_size=1, stride1=1, stride2=2, pad=20)
CORR_CHANNELS = 441


def flownet_c_init(key: jax.Array, in_channels: int = 3, dtype=jnp.float32) -> dict:
    pi = ParamInit(key, dtype)
    pi.conv("conv1", 7, in_channels, 64)
    pi.conv("conv2", 5, 64, 128)
    pi.conv("conv3", 5, 128, 256)
    pi.conv("conv_redir", 1, 256, 32)
    pi.conv("conv3_1", 3, CORR_CHANNELS + 32, 256)
    pi.conv("conv4", 3, 256, 512)
    pi.conv("conv4_1", 3, 512, 512)
    pi.conv("conv5", 3, 512, 512)
    pi.conv("conv5_1", 3, 512, 512)
    pi.conv("conv6", 3, 512, 1024)
    pi.conv("conv6_1", 3, 1024, 1024)
    init_refinement_decoder(
        pi, feature_channels={6: 1024, 5: 512, 4: 512, 3: 256, 2: 128}
    )
    return pi.params


def flownet_c_apply(
    params: dict, img0: jnp.ndarray, img1: jnp.ndarray, *, layout: str = "auto"
) -> dict[str, jnp.ndarray]:
    """img0/img1: (N, H, W, 3) normalized → {"flow2".."flow6"} (net units).
    ``layout``: see flownet_s_apply (full-res head in the s2d domain)."""

    def tower(x):
        c1 = strided_head_block(params, "conv1", x, layout=layout)
        c2 = conv_block(params, "conv2", c1, stride=2)
        c3 = conv_block(params, "conv3", c2, stride=2)
        return c2, c3

    c2a, c3a = tower(img0)
    _c2b, c3b = tower(img1)

    corr = correlation(c3a, c3b, **CORR_KWARGS)
    corr = leaky_relu(corr)
    redir = conv_block(params, "conv_redir", c3a)
    merged = jnp.concatenate([corr, redir], axis=-1)

    c3_1 = conv_block(params, "conv3_1", merged)
    c4 = conv_block(params, "conv4", c3_1, stride=2)
    c4_1 = conv_block(params, "conv4_1", c4)
    c5 = conv_block(params, "conv5", c4_1, stride=2)
    c5_1 = conv_block(params, "conv5_1", c5)
    c6 = conv_block(params, "conv6", c5_1, stride=2)
    c6_1 = conv_block(params, "conv6_1", c6)
    return refinement_decoder(
        params, {6: c6_1, 5: c5_1, 4: c4_1, 3: c3_1, 2: c2a}
    )
