"""Accum: resize-and-concatenate (the reference's ``Accum`` layer).

Reference: src/caffe/layers/accum_layer.{cpp,cu} (accum_layer.cpp:20-82):
every bottom is resized to a common target resolution and concatenated on
the channel axis. Target resolution is (a) the max over inputs, (b) a
reference input's size (``reference`` index), or (c) the max rounded up to
a multiple of ``size_divisible_by``. Used to gather multi-scale features
for fusion-style nets.
"""

from __future__ import annotations

from math import ceil
from typing import Optional, Sequence

import jax.numpy as jnp

from flownet2_tpu.ops.resample import resample


def accum(
    inputs: Sequence[jnp.ndarray],
    *,
    reference: Optional[int] = None,
    size_divisible_by: int = 0,
    method: str = "nearest",
) -> jnp.ndarray:
    """Concatenate (N, h_i, w_i, c_i) inputs at a common resolution.

    method: interpolation for the resizes ("nearest" matches the reference's
    top-resolution gather behavior; "linear" available for smooth features).
    """
    if not inputs:
        raise ValueError("accum requires at least one input")
    if reference is not None:
        th, tw = inputs[reference].shape[1:3]
    else:
        th = max(x.shape[1] for x in inputs)
        tw = max(x.shape[2] for x in inputs)
        if size_divisible_by > 0:
            d = size_divisible_by
            th = int(ceil(th / d) * d)
            tw = int(ceil(tw / d) * d)
    resized = [
        x if x.shape[1:3] == (th, tw) else resample(x, th, tw, method=method)
        for x in inputs
    ]
    return jnp.concatenate(resized, axis=-1)
