"""TPU-native operator library.

Each reference CUDA layer (SURVEY.md §2.2) maps to a module here:

- ``conv``         — NHWC conv / deconv with Caffe-compatible shape arithmetic.
- ``activations``  — leaky ReLU, NegReLU.
- ``correlation``  — 2D/1D cost volume (pure-JAX reference + Pallas kernel).
- ``warp``         — FlowWarp bilinear backward-warping.
- ``channel_norm`` — per-pixel L2 norm over channels.
- ``resample``     — NEAREST/LINEAR/CUBIC resize (±antialias) as separable matmuls.
- ``downsample``   — NaN-aware area downsample as separable matmuls.
- ``losses``       — robust L1/EPE and Lpq losses with NaN masking.
"""

from flownet2_tpu.ops.activations import leaky_relu, neg_relu
from flownet2_tpu.ops.conv import conv2d, deconv2d
from flownet2_tpu.ops.channel_norm import channel_norm
from flownet2_tpu.ops.warp import flow_warp
from flownet2_tpu.ops.resample import resample
from flownet2_tpu.ops.downsample import downsample_nan_aware
from flownet2_tpu.ops.correlation import correlation, correlation_1d, correlation_auto
from flownet2_tpu.ops.losses import epe, l1_loss, lpq_loss, multiscale_l1_loss
from flownet2_tpu.ops.mean import apply_mean
from flownet2_tpu.ops.accum import accum

__all__ = [
    "correlation_auto",
    "epe",
    "l1_loss",
    "lpq_loss",
    "multiscale_l1_loss",
    "apply_mean",
    "accum",
    "leaky_relu",
    "neg_relu",
    "conv2d",
    "deconv2d",
    "channel_norm",
    "flow_warp",
    "resample",
    "downsample_nan_aware",
    "correlation",
    "correlation_1d",
]
