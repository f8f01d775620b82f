"""FlowWarp: backward-warp an image by a flow field with bilinear sampling.

Reference: src/caffe/layers/flow_warp_layer.cpp:58-117 (CPU oracle) and
flow_warp_layer.cu. Conventions reproduced exactly:

- sample position x2 = x + u, y2 = y + v;
- valid iff 0 <= x2 < W and 0 <= y2 < H (note: strict <, so x2 in
  (W-1, W) is "valid" and the right neighbor clamps to the last column);
- corners: L = floor(x2), R = min(L+1, W-1), T = floor(y2), B = min(T+1, H-1);
- invalid pixels are filled with 0.0 or NaN (FlowWarpParameter.fill_value,
  caffe.proto:553-560);
- gradients flow to BOTH the image (bilinear scatter) and the flow
  (image-gradient dot), flow_warp_layer.cpp:119-195. Plain JAX autodiff of
  this gather formulation produces exactly those formulas, so no custom VJP
  is required.

TPU-native design: one fused gather over a flattened (H*W) index per batch
element. The four corner taps are linearized into a single gather of 4 indices
to keep XLA's gather lowering efficient; everything else is VPU arithmetic
that XLA fuses around it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(image: jnp.ndarray, flow: jnp.ndarray, fill_value: float = 0.0) -> jnp.ndarray:
    """Warp ``image`` (N,H,W,C) by ``flow`` (N,H,W,2) → (N,H,W,C).

    out(x, y) = bilinear(image, x + u(x,y), y + v(x,y)); out-of-range targets
    take ``fill_value`` (0.0 or NaN to match the reference's two modes).
    """
    n, h, w, c = image.shape
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")

    orig_dtype = image.dtype
    img = image.astype(jnp.float32)
    flo = flow.astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flo[..., 0]  # (N,H,W)
    y2 = ys[None] + flo[..., 1]

    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)

    # Corner indices. int(x2) in the reference truncates toward zero, which
    # equals floor on the valid region (x2 >= 0); clamp keeps the gather safe
    # on invalid pixels (their output is overwritten by fill_value).
    x2s = jnp.clip(x2, 0.0, w - 1)
    y2s = jnp.clip(y2, 0.0, h - 1)
    ix_l = jnp.floor(x2s).astype(jnp.int32)
    iy_t = jnp.floor(y2s).astype(jnp.int32)
    ix_r = jnp.minimum(ix_l + 1, w - 1)
    iy_b = jnp.minimum(iy_t + 1, h - 1)

    alpha = (x2s - ix_l.astype(jnp.float32))[..., None]  # (N,H,W,1)
    beta = (y2s - iy_t.astype(jnp.float32))[..., None]

    flat = img.reshape(n, h * w, c)

    def tap(iy, ix):
        idx = (iy * w + ix).reshape(n, h * w)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(n, h, w, c)

    tl = tap(iy_t, ix_l)
    tr = tap(iy_t, ix_r)
    bl = tap(iy_b, ix_l)
    br = tap(iy_b, ix_r)

    out = (
        (1 - alpha) * (1 - beta) * tl
        + alpha * (1 - beta) * tr
        + (1 - alpha) * beta * bl
        + alpha * beta * br
    )
    out = jnp.where(valid[..., None], out, jnp.float32(fill_value))
    return out.astype(orig_dtype)
