"""Resample: NEAREST / LINEAR (triangle) / CUBIC resize with optional antialias.

Reference semantics: src/caffe/layers/resample_layer.cu. Key conventions we
reproduce exactly:

- fx = in_w/out_w, fy = in_h/out_h; source coords use the reference's
  *swapped* half-pixel offsets (resample_layer.cu:62-63):
      x_in = x_out * fx + fy/2 - 0.5
      y_in = y_out * fy + fx/2 - 0.5
  (fy in the x formula and vice versa — an upstream quirk that is exact for
  the common square-scale case; ``swapped_half_pixel=False`` gives the
  corrected formula).
- LINEAR/CUBIC sample a window of radius r around round(x_in) with triangle /
  Catmull-Rom-style cubic coefficients (resample_layer.cu:14-33), r per axis =
  2 on upscale else ceil(kernel_width * f) when antialiasing
  (resample_layer.cu:71-74), out-of-bounds samples dropped, output normalized
  by the sum of weights (0 if the window is empty, :93).
- NEAREST picks round(x_in) (C round: half away from zero), clamped in-bounds
  (the reference would read out of bounds on the last pixel; we clamp).
- No backward in the reference (resample_layer.cu:208-213); here the op IS
  differentiable (it is two constant matrices), which training uses freely.

TPU-native design: the sampling is separable, so the whole op is
``out = W_h @ img @ W_w^T`` with dense per-axis weight matrices built in
numpy at trace time (shapes are static under jit) — two MXU matmuls instead
of a gather kernel. Weight normalization (including boundary-clipped windows)
is folded into the matrices row-wise.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


def _bicubic_coeff(x: np.ndarray) -> np.ndarray:
    """Reference resample_layer.cu:14-20 (Catmull-Rom a=-0.5 family)."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m1] = (x[m1] * x[m1] * (1.5 * x[m1] - 2.5) + 1.0)
    out[m2] = x[m2] * (x[m2] * (-0.5 * x[m2] + 2.5) - 4.0) + 2.0
    return out


def _triangle_coeff(x: np.ndarray) -> np.ndarray:
    """Reference resample_layer.cu:28-33."""
    out = np.zeros_like(x)
    m1 = (x >= -1) & (x < 0)
    m2 = (x >= 0) & (x <= 1)
    out[m1] = x[m1] + 1
    out[m2] = 1 - x[m2]
    return out


_KERNEL_WIDTH = {"linear": 2, "cubic": 4}
_COEFF_FN = {"linear": _triangle_coeff, "cubic": _bicubic_coeff}


def _c_round(x: np.ndarray) -> np.ndarray:
    """C round(): half away from zero (np.round is half-to-even)."""
    return np.trunc(x + np.copysign(0.5, x))


@lru_cache(maxsize=256)
def _axis_weights(
    in_size: int,
    out_size: int,
    f: float,
    f_other: float,
    method: str,
    antialias: bool,
    swapped_half_pixel: bool,
) -> np.ndarray:
    """Dense (out_size, in_size) float32 weight matrix for one axis."""
    half = (f_other if swapped_half_pixel else f) / 2.0
    coords_out = np.arange(out_size, dtype=np.float64)
    x_in = coords_out * f + half - 0.5  # (out,)

    if method == "nearest":
        idx = _c_round(x_in).astype(np.int64)
        idx = np.clip(idx, 0, in_size - 1)
        w = np.zeros((out_size, in_size), dtype=np.float32)
        w[np.arange(out_size), idx] = 1.0
        return w

    coeff = _COEFF_FN[method]
    kernel_width = _KERNEL_WIDTH[method]
    a = 1.0 / f if (antialias and f > 1.0) else 1.0
    r = 2 if f < 1.0 else int(np.ceil(kernel_width / a))

    x_round = _c_round(x_in).astype(np.int64)  # (out,)
    offsets = np.arange(-r, r + 1)  # (2r+1,)
    sample_idx = x_round[:, None] + offsets[None, :]  # (out, 2r+1)
    dx = x_in[:, None] - sample_idx  # (out, 2r+1)
    weights = a * coeff(a * dx)  # (out, 2r+1)
    valid = (sample_idx >= 0) & (sample_idx < in_size)
    weights = np.where(valid, weights, 0.0)

    w = np.zeros((out_size, in_size), dtype=np.float64)
    np.add.at(w, (np.repeat(np.arange(out_size), offsets.size), np.clip(sample_idx, 0, in_size - 1).ravel()), weights.ravel())
    # Per-output normalization by the weight sum; empty windows → 0 (cu:93).
    # NOTE: normalization must use the 2-D wsum (product of both axes); since
    # wsum factorizes as wsum_y * wsum_x, normalizing each axis independently
    # is exact.
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum != 0, w / np.where(wsum == 0, 1.0, wsum), 0.0)
    return w.astype(np.float32)


def resample(
    x: jnp.ndarray,
    out_height: int,
    out_width: int,
    *,
    method: str = "linear",
    antialias: bool = True,
    swapped_half_pixel: bool = True,
) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., out_height, out_width, C).

    method: "nearest" | "linear" | "cubic". ``antialias`` only affects
    downscaling (reference resample_layer.cu:179-180).
    """
    if method not in ("nearest", "linear", "cubic"):
        raise ValueError(f"unsupported resample method {method!r}")
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_height, out_width):
        return x
    fx = in_w / out_width
    fy = in_h / out_height
    w_h = jnp.asarray(
        _axis_weights(in_h, out_height, fy, fx, method, antialias, swapped_half_pixel)
    )
    w_w = jnp.asarray(
        _axis_weights(in_w, out_width, fx, fy, method, antialias, swapped_half_pixel)
    )
    # (..., H, W, C): contract H then W on the MXU.
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    out = jnp.einsum("oh,...hwc->...owc", w_h, xf, precision="highest")
    out = jnp.einsum("pw,...owc->...opc", w_w, out, precision="highest")
    return out.astype(dtype)


def upsample_flow_2x(flow: jnp.ndarray) -> jnp.ndarray:
    """Convenience: 2x nearest upsample used between decoder scales."""
    return resample(flow, flow.shape[-3] * 2, flow.shape[-2] * 2, method="nearest")
