"""Correlation (cost volume) — the defining FlowNetC operator — plus its 1-D
(stereo) variant.

Reference semantics (src/caffe/layers/correlation_layer.{cpp,cu}):

- both inputs are zero-padded by ``pad`` on each spatial side;
- geometry (correlation_layer.cpp:56-70):
    kernel_radius  kr = (k-1)//2          (k must be odd)
    border         b  = max_displacement + kr
    out_h          = ceil((H + 2*pad - 2*b) / stride1)   (same for W)
    grid_radius    gr = max_displacement // stride2
    grid_width     gw = 2*gr + 1,   out_channels = gw**2
- output channel d ↔ displacement (dy, dx) = ((d//gw - gr)*stride2,
  (d%gw - gr)*stride2) — y-major, matching correlation_layer.cu:81-82;
- MULTIPLY: out = (1/(k*k*C)) * Σ_{j,i,c} f1p[y1+j, x1+i, c] *
  f2p[y1+dy+j, x1+dx+i, c] with patch origin y1 = y*stride1 + max_displacement
  (correlation_layer.cu:56-108);
- SUBTRACT: mean |a - b| over the same window (correlation_layer.cu:252-290);
- ``do_abs`` is parsed by the reference but never used by its kernels
  (correlation_layer.cpp:29 vs. the .cu file) — we mirror that: accepted,
  ignored;
- gradients to both inputs (correlation_layer.cu:118-249). The displacement-
  range-inversion logic there is exactly the transpose of this linear op, so
  JAX autodiff through this formulation reproduces it; no hand-written VJP is
  needed for correctness (a fused Pallas backward is a performance option).

TPU-native design: per displacement, the cost slice is an elementwise
multiply + channel reduction of two shifted views — VPU work that XLA fuses;
the kernel window is a separable k×k box-sum; stride1 is a strided slice.
A `lax.scan` over the gw² displacements keeps compile time and HBM footprint
flat (only one (N, H', W') slice is live per step). The fused Pallas version
lives in ``flownet2_tpu.ops.pallas.correlation``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def correlation_output_shape(
    height: int,
    width: int,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
) -> tuple[int, int, int]:
    """(out_h, out_w, out_channels) per correlation_layer.cpp:56-70."""
    kr = (kernel_size - 1) // 2
    border = max_displacement + kr
    out_h = math.ceil((height + 2 * pad - 2 * border) / stride1)
    out_w = math.ceil((width + 2 * pad - 2 * border) / stride1)
    gr = max_displacement // stride2
    gw = 2 * gr + 1
    return out_h, out_w, gw * gw


@partial(
    jax.jit,
    static_argnames=(
        "max_displacement",
        "kernel_size",
        "stride1",
        "stride2",
        "pad",
        "multiply",
        "do_abs",
    ),
)
def correlation(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
    multiply: bool = True,
    do_abs: bool = False,
) -> jnp.ndarray:
    """Cost volume of f1 vs f2, both (N, H, W, C) → (N, out_h, out_w, gw²).

    FlowNetC uses max_displacement=20, kernel_size=1, stride1=1, stride2=2,
    pad=20 → 441 output channels at the conv3 resolution.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd (correlation_layer.cpp:22)")
    if f1.shape != f2.shape:
        raise ValueError(f"input shapes differ: {f1.shape} vs {f2.shape}")
    del do_abs  # parsed but unused by the reference kernels; kept for parity

    n, h, w, c = f1.shape
    kr = (kernel_size - 1) // 2
    md = max_displacement
    out_h, out_w, out_c = correlation_output_shape(
        h,
        w,
        max_displacement=md,
        kernel_size=kernel_size,
        stride1=stride1,
        stride2=stride2,
        pad=pad,
    )
    if out_h < 1 or out_w < 1:
        raise ValueError("correlation window does not fit in input")
    gr = md // stride2
    gw = 2 * gr + 1

    # Fusion barrier: letting XLA fuse the 441-step displacement scan into
    # the surrounding conv stack sends TPU compile time from ~1 minute to
    # >10 minutes (observed on v5e); isolating the scan keeps the program
    # tractable at no measurable runtime cost.
    f1, f2 = lax.optimization_barrier((f1, f2))

    pad_cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    f1p = jnp.pad(f1.astype(jnp.float32), pad_cfg)
    f2p = jnp.pad(f2.astype(jnp.float32), pad_cfg)

    # Patch-origin span in padded coords: rows md .. md+(out_h-1)*s1+k-1.
    span_h = (out_h - 1) * stride1 + kernel_size
    span_w = (out_w - 1) * stride1 + kernel_size
    f1_span = lax.slice(
        f1p, (0, md, md, 0), (n, md + span_h, md + span_w, c)
    )  # (N, span_h, span_w, C)

    # Scan over displacement ROWS (gw steps), horizontal displacements
    # unrolled: each step reads one (N, span_h, W-padded, C) row block ONCE
    # and produces all gw horizontal slices from it. A flat scan over gw²
    # displacements re-reads ~the whole padded tensor every step and is
    # HBM-bandwidth-bound (~6× slower measured on v5e).
    wp = f2p.shape[2]

    def one_row(_, p):
        dy = (p - gr) * stride2
        row_block = lax.dynamic_slice(
            f2p, (0, md + dy, 0, 0), (n, span_h, wp, c)
        )
        qs = []
        for o in range(gw):
            dx = (o - gr) * stride2
            f2_span = lax.slice(
                row_block, (0, 0, md + dx, 0), (n, span_h, md + dx + span_w, c)
            )
            if multiply:
                q = jnp.sum(f1_span * f2_span, axis=-1)  # (N, span_h, span_w)
            else:
                q = jnp.sum(jnp.abs(f1_span - f2_span), axis=-1)
            # k×k box sum (identity for k=1), then stride1 subsampling.
            if kernel_size > 1:
                q = lax.reduce_window(
                    q,
                    0.0,
                    lax.add,
                    window_dimensions=(1, kernel_size, kernel_size),
                    window_strides=(1, 1, 1),
                    padding="VALID",
                )
            qs.append(q[:, :: stride1, :: stride1])
        return None, jnp.stack(qs, axis=0)  # (gw, N, out_h, out_w)

    _, stacked = lax.scan(
        one_row, None, jnp.arange(gw, dtype=jnp.int32)
    )  # (gw, gw, N, out_h, out_w)
    out = jnp.transpose(
        stacked.reshape(gw * gw, n, out_h, out_w), (1, 2, 3, 0)
    )  # (N, out_h, out_w, gw²)
    norm = kernel_size * kernel_size * c
    out = (out / norm).astype(f1.dtype)
    return lax.optimization_barrier(out)


from functools import lru_cache


def _corr_flownet_bwd_scans(f1, f2, g, *, md: int, stride2: int):
    """Hand-derived gradients for the k=1/s1=1/pad=md correlation.

    These are the transposes the reference hand-writes as the inverted
    displacement-range kernels (correlation_layer.cu:118-249), expressed as
    scans over the displacement grid (each step full-tensor elementwise work
    — the same parallel structure as the forward, unlike autodiff's
    residual-carrying reverse scan, which measured ~3× slower in the
    training step on v5e):

      df1[y,x,c]  = (1/C)·Σ_d g[y,x,d] · f2p[y+md+dy, x+md+dx, c]
      df2[y',x',c] = (1/C)·Σ_d g[y'-dy, x'-dx, d] · f1[y'-dy, x'-dx, c]
    """
    n, h, w, c = f1.shape
    gr = md // stride2
    gw = 2 * gr + 1
    g = g.astype(jnp.float32)
    f1f = f1.astype(jnp.float32)
    pad_cfg = ((0, 0), (md, md), (md, md), (0, 0))
    f2p = jnp.pad(f2.astype(jnp.float32), pad_cfg)
    inv_norm = 1.0 / c
    wp = w + 2 * md

    # Both scans chunk by displacement ROW (gw steps) with the horizontal
    # displacements unrolled inside each step — one row-block of HBM traffic
    # per step instead of a full accumulator pass per displacement (see the
    # forward's note; this is what makes training-time correlation cheap).

    def df1_step(acc, p):
        dy = (p - gr) * stride2
        row_block = lax.dynamic_slice(f2p, (0, md + dy, 0, 0), (n, h, wp, c))
        g_row = lax.dynamic_slice(g, (0, 0, 0, p * gw), (n, h, w, gw))
        contrib = jnp.zeros_like(acc)
        for o in range(gw):
            dx = (o - gr) * stride2
            sl = lax.slice(row_block, (0, 0, md + dx, 0), (n, h, md + dx + w, c))
            contrib = contrib + g_row[..., o : o + 1] * sl
        return acc + contrib, None

    df1, _ = lax.scan(
        df1_step, jnp.zeros((n, h, w, c), jnp.float32), jnp.arange(gw)
    )

    def df2_step(accp, p):
        dy = (p - gr) * stride2
        g_row = lax.dynamic_slice(g, (0, 0, 0, p * gw), (n, h, w, gw))
        # all horizontal placements land in the same padded row block
        row = jnp.zeros((n, h, wp, c), jnp.float32)
        for o in range(gw):
            dx = (o - gr) * stride2
            contrib = g_row[..., o : o + 1] * f1f
            row = row + jnp.pad(
                contrib, ((0, 0), (0, 0), (md + dx, md - dx), (0, 0))
            )
        start = (0, md + dy, 0, 0)
        cur = lax.dynamic_slice(accp, start, (n, h, wp, c))
        return lax.dynamic_update_slice(accp, cur + row, start), None

    accp, _ = lax.scan(
        df2_step,
        jnp.zeros((n, h + 2 * md, wp, c), jnp.float32),
        jnp.arange(gw),
    )
    df2 = lax.slice(accp, (0, md, md, 0), (n, md + h, md + w, c))
    return (
        (df1 * inv_norm).astype(f1.dtype),
        (df2 * inv_norm).astype(f2.dtype),
    )


@lru_cache(maxsize=None)
def _make_fast_correlation(max_displacement: int, stride2: int, use_pallas: bool):
    """custom-VJP correlation for the FlowNet config (k=1, s1=1, pad=md):
    forward via the Pallas kernel or the XLA scan, backward via the
    hand-derived displacement scans above."""
    md = max_displacement

    def fwd_impl(f1, f2):
        if use_pallas:
            from flownet2_tpu.ops.pallas.correlation import correlation_pallas

            return correlation_pallas(f1, f2, max_displacement=md, stride2=stride2)
        return correlation(
            f1, f2, max_displacement=md, kernel_size=1, stride1=1,
            stride2=stride2, pad=md,
        )

    @jax.custom_vjp
    def fast(f1, f2):
        return fwd_impl(f1, f2)

    def fwd(f1, f2):
        return fast(f1, f2), (f1, f2)

    def bwd(res, g):
        f1, f2 = res
        g = lax.optimization_barrier(g)
        out = _corr_flownet_bwd_scans(f1, f2, g, md=md, stride2=stride2)
        return lax.optimization_barrier(out)

    fast.defvjp(fwd, bwd)
    return fast


def correlation_auto(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
    multiply: bool = True,
    do_abs: bool = False,
) -> jnp.ndarray:
    """Dispatch to the custom-VJP FlowNet-config path (hand-derived backward;
    forward via Pallas if opted in, else the XLA scan), falling back to the
    general reference path for other configs."""
    import os

    flownet_config = (
        multiply and kernel_size == 1 and stride1 == 1 and pad == max_displacement
    )
    if flownet_config:
        # the Mosaic kernel is opt-in until it beats the XLA scan formulation
        use_pallas = (
            jax.default_backend() != "cpu"
            and os.environ.get("FLOWNET2_TPU_PALLAS_CORR", "0") == "1"
        )
        return _make_fast_correlation(max_displacement, stride2, use_pallas)(f1, f2)
    return correlation(
        f1,
        f2,
        max_displacement=max_displacement,
        kernel_size=kernel_size,
        stride1=stride1,
        stride2=stride2,
        pad=pad,
        multiply=multiply,
        do_abs=do_abs,
    )


@partial(
    jax.jit,
    static_argnames=(
        "max_displacement",
        "kernel_size",
        "stride1",
        "stride2",
        "pad",
        "single_direction",
        "multiply",
        "do_abs",
    ),
)
def correlation_1d(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    *,
    max_displacement: int,
    kernel_size: int = 1,
    stride1: int = 1,
    stride2: int = 1,
    pad: int = 0,
    single_direction: int = 0,
    multiply: bool = True,
    do_abs: bool = False,
) -> jnp.ndarray:
    """1-D (horizontal) correlation for stereo/disparity (DispNetC-style).

    Reference: src/caffe/layers/correlation_layer1d.{cpp,cu}. Differences from
    2-D: padding applies to width only; no vertical displacement; the vertical
    patch origin is y*stride1 (+kr window); ``single_direction`` -1/+1
    restricts the search to the left/right side (gw = gr + 1), 0 searches both
    (gw = 2*gr + 1).
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    if f1.shape != f2.shape:
        raise ValueError(f"input shapes differ: {f1.shape} vs {f2.shape}")
    del do_abs

    n, h, w, c = f1.shape
    kr = (kernel_size - 1) // 2
    md = max_displacement
    border = md + kr
    out_w = math.ceil((w + 2 * pad - 2 * border) / stride1)
    out_h = math.ceil((h - 2 * kr) / stride1)
    gr = md // stride2
    if single_direction != 0:
        gw = gr + 1
        x_shift = -gr if single_direction < 0 else 0
    else:
        gw = 2 * gr + 1
        x_shift = -gr

    pad_cfg = ((0, 0), (0, 0), (pad, pad), (0, 0))
    f1p = jnp.pad(f1.astype(jnp.float32), pad_cfg)
    f2p = jnp.pad(f2.astype(jnp.float32), pad_cfg)

    span_h = (out_h - 1) * stride1 + kernel_size
    span_w = (out_w - 1) * stride1 + kernel_size
    f1_span = lax.slice(f1p, (0, 0, md, 0), (n, span_h, md + span_w, c))

    def one_displacement(_, d):
        dx = (d + x_shift) * stride2
        f2_span = lax.dynamic_slice(f2p, (0, 0, md + dx, 0), (n, span_h, span_w, c))
        if multiply:
            q = jnp.sum(f1_span * f2_span, axis=-1)
        else:
            q = jnp.sum(jnp.abs(f1_span - f2_span), axis=-1)
        if kernel_size > 1:
            q = lax.reduce_window(
                q,
                0.0,
                lax.add,
                window_dimensions=(1, kernel_size, kernel_size),
                window_strides=(1, 1, 1),
                padding="VALID",
            )
        q = q[:, :: stride1, :: stride1]
        return None, q

    _, stacked = lax.scan(one_displacement, None, jnp.arange(gw, dtype=jnp.int32))
    out = jnp.transpose(stacked, (1, 2, 3, 0))
    norm = kernel_size * kernel_size * c
    return (out / norm).astype(f1.dtype)
