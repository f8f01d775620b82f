"""NaN-aware area downsample (the reference's ``Downsample`` layer).

Reference: src/caffe/layers/downsample_layer.cu:15-72. Semantics:

- align-corners mapping: src center = dest/(out-1) * (in-1);
- triangle weights w = max(0, 1-|bx-cx|/sx) * max(0, 1-|by-cy|/sy) with
  sx = (in_w-1)/(out_w-1), window radius ceil(s) per axis;
- NaN samples contribute their weight to a NaN vote instead of the value sum;
  if the NaN weight fraction exceeds 0.5 the output is NaN (cu:63-67);
- identity size is a passthrough (downsample_layer.cpp:53-56);
- no backward in the reference (we expose a nondifferentiable op: it is used
  only on ground truth).

TPU-native design: the weights are separable, and the NaN bookkeeping is a
set of bilinear forms over {masked values, mask, nan-weights}, so the whole
op is three pairs of dense matmuls (MXU) + a select — no gather kernel.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=256)
def _axis_weights_down(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) unnormalized triangle weights, align-corners."""
    if out_size == 1:
        # Degenerate: reference divides by (out-1); mirror its behavior for
        # out>1 only and center the single output on source center.
        scale = float(in_size)
        centers = np.array([(in_size - 1) / 2.0])
    else:
        scale = (in_size - 1) / (out_size - 1)
        centers = np.arange(out_size, dtype=np.float64) * scale
    radius = int(np.ceil(scale))
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i, c in enumerate(centers):
        ic = int(np.floor(c + 0.5))  # C round() for non-negative centers
        for off in range(-radius, radius + 1):
            j = ic + off
            if 0 <= j < in_size:
                w[i, j] = max(0.0, 1.0 - abs(j - c) / scale)
    return w.astype(np.float32)


def downsample_nan_aware(x: jnp.ndarray, out_height: int, out_width: int) -> jnp.ndarray:
    """Downsample (..., H, W, C) → (..., out_height, out_width, C).

    Matches the reference kernel including NaN voting. Identity size returns
    the input unchanged (blob-sharing passthrough in the reference).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_height, out_width):
        return x

    w_h = jnp.asarray(_axis_weights_down(in_h, out_height))  # (oh, h)
    w_w = jnp.asarray(_axis_weights_down(in_w, out_width))  # (ow, w)

    x = jax.lax.stop_gradient(x)
    xf = x.astype(jnp.float32)
    nan_mask = jnp.isnan(xf)
    valid = (~nan_mask).astype(jnp.float32)
    vals = jnp.where(nan_mask, 0.0, xf)

    def bilinear(z):
        z = jnp.einsum("oh,...hwc->...owc", w_h, z, precision="highest")
        return jnp.einsum("pw,...owc->...opc", w_w, z, precision="highest")

    accum_value = bilinear(vals * valid)
    accum_weight = bilinear(valid)
    accum_nan = bilinear(nan_mask.astype(jnp.float32))

    out = accum_value / jnp.where(accum_weight == 0, 1.0, accum_weight)
    is_nan_out = accum_nan / jnp.where(accum_weight == 0, 1.0, accum_weight) > 0.5
    # Reference: accum_nan/accum_weight > 0.5 → NaN; all-NaN windows (weight 0)
    # divide 0/0 → NaN in the reference, reproduce via the weight==0 case.
    is_nan_out = is_nan_out | ((accum_weight == 0) & (accum_nan > 0))
    out = jnp.where(is_nan_out, jnp.nan, out)
    return out.astype(x.dtype)
