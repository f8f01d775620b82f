"""DispNetC: the stereo/disparity sibling of FlowNetC.

The reference tree ships the building blocks — ``Correlation1D``
(correlation_layer1d.{cpp,cu}), ``DisparityData`` (disparity_data_layer.cpp)
and the disparity LMDB packer (convert_imageset_and_disparity.cpp) — but not
the net itself (DispNet, Mayer et al. CVPR 2016, trains outside this repo).
This model exercises that 1-D stereo path end to end:

- siamese conv1 (7×7/2, 64) and conv2 (5×5/2, 128) towers;
- Correlation1D at the conv2 scale (stride 4): max_displacement=40,
  ``single_direction=-1`` — disparity shifts are one-sided, matching the
  reference's negativity convention (disparity_data_layer.cpp:29) → 41
  channels — plus a 1×1 conv_redir (64ch) on the left tower;
- conv3..conv6b encoder on the concatenated 105 channels;
- the FlowNetS-style refinement decoder with 1-channel ``pr6..pr2``
  disparity predictions (models/common.refinement_decoder with
  pred_channels=1).

Correlation1D uses the MXU banded-matmul formulation with a hand-derived
VJP (ops/correlation.correlation_1d_auto).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tpu.models.common import (
    ParamInit,
    conv_block,
    init_refinement_decoder,
    refinement_decoder,
)
from flownet2_tpu.ops.activations import leaky_relu
from flownet2_tpu.ops.correlation import correlation_1d_auto

CORR1D_KWARGS = dict(
    max_displacement=40, kernel_size=1, stride1=1, stride2=1, pad=40,
    single_direction=-1,
)
CORR1D_CHANNELS = 41


def dispnet_c_init(key: jax.Array, in_channels: int = 3, dtype=jnp.float32) -> dict:
    pi = ParamInit(key, dtype)
    pi.conv("conv1", 7, in_channels, 64)
    pi.conv("conv2", 5, 64, 128)
    pi.conv("conv_redir", 1, 128, 64)
    pi.conv("conv3", 5, CORR1D_CHANNELS + 64, 256)
    pi.conv("conv3_1", 3, 256, 256)
    pi.conv("conv4", 3, 256, 512)
    pi.conv("conv4_1", 3, 512, 512)
    pi.conv("conv5", 3, 512, 512)
    pi.conv("conv5_1", 3, 512, 512)
    pi.conv("conv6", 3, 512, 1024)
    pi.conv("conv6_1", 3, 1024, 1024)
    init_refinement_decoder(
        pi,
        feature_channels={6: 1024, 5: 512, 4: 512, 3: 256, 2: 128},
        pred_channels=1,
    )
    return pi.params


def dispnet_c_apply(params: dict, img_left: jnp.ndarray, img_right: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """img_left/right: (N, H, W, 3) normalized → {"flow6".."flow2"}, each a
    1-channel disparity map at strides 64..4 (decoder naming kept so the
    multi-scale loss and tooling apply unchanged)."""

    def tower(x):
        c1 = conv_block(params, "conv1", x, stride=2)
        c2 = conv_block(params, "conv2", c1, stride=2)
        return c2

    c2l = tower(img_left)
    c2r = tower(img_right)

    corr = correlation_1d_auto(c2l, c2r, **CORR1D_KWARGS)
    corr = leaky_relu(corr)
    redir = conv_block(params, "conv_redir", c2l)
    merged = jnp.concatenate([corr, redir], axis=-1)

    c3 = conv_block(params, "conv3", merged, stride=2)
    c3_1 = conv_block(params, "conv3_1", c3)
    c4 = conv_block(params, "conv4", c3_1, stride=2)
    c4_1 = conv_block(params, "conv4_1", c4)
    c5 = conv_block(params, "conv5", c4_1, stride=2)
    c5_1 = conv_block(params, "conv5_1", c5)
    c6 = conv_block(params, "conv6", c5_1, stride=2)
    c6_1 = conv_block(params, "conv6_1", c6)
    return refinement_decoder(
        params, {6: c6_1, 5: c5_1, 4: c4_1, 3: c3_1, 2: c2l}
    )
