"""Fused Pallas TPU kernel for the windowed bilinear flow warp.

The XLA windowed one-hot formulation (ops/warp.flow_warp_windowed) is
latency-bound: an 80-step lax.scan of tiny matmuls plus full-size one-hot
transients. This kernel runs the same algorithm as one grid-pipelined
program — per (batch, row-tile, column-chunk) cell it DMAs a small
dynamically-positioned source window into VMEM, builds *triangular* lerp
weights in registers (relu(1 - |s - x|) is the two-tap bilinear row — no
one-hot compares needed), contracts on the MXU, and reduces the vertical
lerp on the VPU. No HBM transients, no per-step dispatch.

Reference semantics (src/caffe/layers/flow_warp_layer.cpp:58-117): sample
at (x+u, y+v); valid iff 0 <= x2 < W, 0 <= y2 < H (strict, so the last
row/column clamps); invalid pixels take fill_value. The clamp conventions
live in the *coordinates* handed to the kernel (x2 clipped to [0, W-1]),
so the triangular weight reproduces min(ix+1, W-1) exactly.

Approximation contract (identical shape to flow_warp_windowed, different
constants): per output tile the bilinear footprint must fit the window.
Window bases are aligned (y to 8 rows, x to 128 lanes) for Mosaic, so the
guaranteed budgets are |Δx| <= SW - CK - 129 and |Δy| <= VW - RT - 9
within one (RT x CK) tile; outliers clamp to the window edge. With
SW=512/CK=256 and VW=80/RT=16 those budgets are 127 px horizontal and
55 px vertical — matching the hand windowed backward's guarantees
(ops/warp._flow_warp_windowed_bwd: rt=8/ck=256/sw=384/vw=64, unaligned
bases → 127/55), so forward and gradient agree on every pixel within
budget (ADVICE r2 #1: the previous SW=384 made the worst-case horizontal
budget NEGATIVE, strictly tighter than the backward's).

Layout note: images move through the kernel in NCHW so the (vw, sw)
window dims are the tiled (sublane, lane) pair — NHWC would put C=3 on
the 128-wide lane dim (42x padding). The wrapper transposes in/out; XLA
fuses those relayouts into neighbours.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile geometry. RT rows amortize one window DMA over RT row-matmuls; VW is
# the vertical window; each CK-column output chunk contracts against an
# SW-column window. A single-full-width-chunk variant (ck=sw=padded W, no
# horizontal windowing) measured FASTER in isolation at 448 wide but ~1 ms
# SLOWER inside the full cascade — keep the windowed geometry everywhere.
# VW=80 (not 64) buys the 55-px vertical budget that matches the windowed
# backward; SW=512 (not 384) makes the horizontal budget non-negative
# (127 px) under 128-aligned bases — see the module docstring.
RT = 16
VW = 80


def _geometry(w: int):
    """-> (ck, sw, wim): column chunk, source window, padded image width."""
    sw = 512
    wim = max(-(-w // 128) * 128, sw)
    return 256, sw, wim


def _warp_kernel(
    x0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window column bases
    y0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window row bases
    xc_ref,  # (1, RT, CK) VMEM f32: clamped continuous source x
    yc_ref,  # (1, RT, CK) VMEM f32: clamped continuous source y
    img_ref,  # (N, C, Hp, Wp) ANY/HBM
    out_ref,  # (1, C, RT, CK) VMEM
    win_ref,  # (C, VW, SW) VMEM scratch
    sem,
    *,
    channels: int,
    ck: int,
    sw: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)
    cell = (b * pl.num_programs(1) + t) * pl.num_programs(2) + k
    x0 = pl.multiple_of(x0_ref[cell], 128)
    y0 = pl.multiple_of(y0_ref[cell], 8)

    copy = pltpu.make_async_copy(
        img_ref.at[b, :, pl.ds(y0, VW), pl.ds(x0, sw)], win_ref, sem
    )
    copy.start()

    c = channels
    # Mosaic's iota is integer-only; cast for the triangular weights.
    s_iota = lax.broadcasted_iota(jnp.int32, (sw, ck), 0).astype(jnp.float32)
    v_iota = lax.broadcasted_iota(jnp.int32, (VW, ck), 0).astype(jnp.float32)

    copy.wait()
    win = win_ref[...].reshape(c * VW, sw)

    for r in range(RT):
        # Triangular two-tap weights relative to the window base. Clamping
        # into the window interior makes out-of-budget pixels stick to the
        # window edge (the documented windowed-warp divergence).
        xr = jnp.clip(xc_ref[0, r, :] - x0.astype(jnp.float32), 0.0, sw - 1)
        yr = jnp.clip(yc_ref[0, r, :] - y0.astype(jnp.float32), 0.0, VW - 1)
        oht = jnp.maximum(1.0 - jnp.abs(s_iota - xr[None, :]), 0.0)  # (SW, CK)
        vt = jnp.maximum(1.0 - jnp.abs(v_iota - yr[None, :]), 0.0)  # (VW, CK)
        hsel = jax.lax.dot_general(
            win,
            oht.astype(win.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C*VW, CK)
        h3 = hsel.reshape(c, VW, ck)
        out_ref[0, :, r, :] = jnp.sum(h3 * vt[None], axis=1).astype(out_ref.dtype)


def flow_warp_pallas(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed bilinear warp as one fused Pallas program.

    image: (N, H, W, C), flow: (N, H, W, 2) -> (N, H, W, C). Forward only —
    ``ops.warp.flow_warp`` wires a custom VJP that reuses the XLA windowed
    formulation's gradients for training.
    """
    n, h, w, c = image.shape
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")
    orig_dtype = image.dtype
    cdtype = jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    x2c = jnp.clip(x2, 0.0, w - 1)
    y2c = jnp.clip(y2, 0.0, h - 1)

    ck, sw, wim = _geometry(w)
    # Pad the output grid to whole (RT, ck) tiles. Coordinate pads are LARGE
    # so the per-tile min (the window base) ignores them — zero pads would
    # drag the base to 0 in partial chunks and clamp every real pixel whose
    # source lies beyond the window (see ops/warp.flow_warp_windowed).
    hp = -(-h // RT) * RT
    wp = -(-w // ck) * ck
    pad2 = ((0, 0), (0, hp - h), (0, wp - w))
    big = float(2 * max(h, w))
    xcp = jnp.pad(x2c, pad2, constant_values=big)
    ycp = jnp.pad(y2c, pad2, constant_values=big)
    nt, nc = hp // RT, wp // ck

    # Window bases: per-tile minimum source coordinate, tile-aligned down,
    # clamped so the window stays inside the padded image.
    him = max(-(-max(h, VW) // 8) * 8, VW)
    x0 = jnp.min(xcp.reshape(n, nt, RT, nc, ck), axis=(2, 4)).astype(jnp.int32)
    y0 = jnp.min(ycp.reshape(n, nt, RT, nc, ck), axis=(2, 4)).astype(jnp.int32)
    x0 = jnp.clip(x0 // 128 * 128, 0, wim - sw).reshape(-1)
    y0 = jnp.clip(y0 // 8 * 8, 0, him - VW).reshape(-1)

    imgT = jnp.pad(
        jnp.transpose(image.astype(cdtype), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, him - h), (0, wim - w)),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nt, nc),
        in_specs=[
            pl.BlockSpec(
                (1, RT, ck), lambda b, t, k, x0, y0: (b, t, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, RT, ck), lambda b, t, k, x0, y0: (b, t, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, RT, ck), lambda b, t, k, x0, y0: (b, 0, t, k), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((c, VW, sw), cdtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    outT = pl.pallas_call(
        partial(_warp_kernel, channels=c, ck=ck, sw=sw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), cdtype),
        interpret=interpret,
    )(x0, y0, xcp, ycp, imgT)

    out = jnp.transpose(outT, (0, 2, 3, 1))[:, :h, :w]
    out = jnp.where(valid[..., None], out, jnp.float32(fill_value))
    return out.astype(orig_dtype)
