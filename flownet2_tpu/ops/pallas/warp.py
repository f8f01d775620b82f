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
SW=384/CK=128 and VW=80/RT=16 those budgets are 127 px horizontal and
55 px vertical — matching the hand windowed backward's guarantees
(ops/warp._flow_warp_windowed_bwd: rt=8/ck=256/sw=384/vw=64, unaligned
bases → 127/55), so forward and gradient agree on every pixel within
budget (ADVICE r2 #1: an SW=384/CK=256 combination would make the
worst-case horizontal budget NEGATIVE — CK=128 keeps it at 127 px with
25% fewer FLOPs than the round-2 SW=512/CK=256 geometry).

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
# Guaranteed per-tile vertical flow budget under 8-row-aligned window bases
# (module docstring: |Δy| <= VW - RT - 9). The halo-exchange sharded warp
# (ops/warp.flow_warp_halo) derives its default halo from this same
# constant: halo = VERTICAL_BUDGET + 1 rows covers the bilinear footprint
# of any in-budget sample, so the sharded clamp contract matches the
# single-chip Pallas/windowed kernels row for row.
VERTICAL_BUDGET = VW - RT - 9  # = 55 px


def _geometry(w: int):
    """-> (ck, sw, wim): column chunk, source window, padded image width.

    CK=128/SW=384 (was 256/512): same 127-px horizontal budget
    (SW-CK-129), 25% fewer matmul FLOPs per output pixel (the kernel is
    MXU-bound: FLOPs ∝ C·VW·SW per CK columns), N=CK=128 still fills the
    lanes. The extra cells' window DMAs are hidden by double-buffering.
    wim (128-aligned) and sw (=3·128) keep the x0 clamp bound wim-sw a
    multiple of 128, preserving the pl.multiple_of contract."""
    sw = 384
    wim = max(-(-w // 128) * 128, sw)
    return 128, sw, wim


def _warp_kernel(
    x0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window column bases
    y0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window row bases
    xc_ref,  # (1, RT, CK) VMEM f32: clamped continuous source x
    yc_ref,  # (1, RT, CK) VMEM f32: clamped continuous source y
    img_ref,  # (N, C, Hp, Wp) ANY/HBM
    out_ref,  # (1, C, RT, CK) VMEM
    win_ref,  # (2, C, VW, SW) VMEM scratch (double-buffered)
    sem,
    *,
    channels: int,
    ck: int,
    sw: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)
    nt_g = pl.num_programs(1)
    nc_g = pl.num_programs(2)
    cell = (b * nt_g + t) * nc_g + k
    ncells = pl.num_programs(0) * nt_g * nc_g

    # Double-buffered window DMA: prefetch cell+1's window (its base comes
    # from the scalar-prefetch refs) while this cell contracts — the serial
    # start/wait left the MXU idle for the full window fetch every cell.
    def dma(slot, ci):
        x0 = pl.multiple_of(x0_ref[ci], 128)
        y0 = pl.multiple_of(y0_ref[ci], 8)
        bi = ci // (nt_g * nc_g)
        return pltpu.make_async_copy(
            img_ref.at[bi, :, pl.ds(y0, VW), pl.ds(x0, sw)],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(cell == 0)
    def _():
        dma(0, 0).start()

    @pl.when(cell + 1 < ncells)
    def _():
        dma((cell + 1) % 2, cell + 1).start()

    c = channels
    # Mosaic's iota is integer-only; cast for the triangular weights.
    s_iota = lax.broadcasted_iota(jnp.int32, (sw, ck), 0).astype(jnp.float32)
    v_iota = lax.broadcasted_iota(jnp.int32, (VW, ck), 0).astype(jnp.float32)

    dma(cell % 2, cell).wait()
    x0 = pl.multiple_of(x0_ref[cell], 128)
    y0 = pl.multiple_of(y0_ref[cell], 8)
    win = win_ref[cell % 2].reshape(c * VW, sw)
    # f32 operands at DEFAULT precision truncate to one bf16 pass on the
    # MXU (ADVICE r4 #1: ~0.037 px error on the f32 GT-flow pass-through).
    # HIGHEST splits f32 into 3 bf16 passes covering all 24 mantissa bits,
    # so {0,1} one-hot / triangular weights pass values through BIT-exactly.
    # bf16 inputs (the production image path) are unaffected.
    prec = lax.Precision.HIGHEST if win.dtype == jnp.float32 else None

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
            precision=prec,
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
    ``ops.warp.flow_warp`` wires a custom VJP (flow_warp_pallas_bwd on
    accelerators, the XLA windowed gradients elsewhere).
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
            pltpu.VMEM((2, c, VW, sw), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
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


# -- Fused backward ----------------------------------------------------------
# The exact VJP of flow_warp_pallas (same window bases, same tile geometry,
# same clamping), fused into one grid program. Replaces the XLA windowed
# hand-backward (ops/warp._flow_warp_windowed_bwd) on accelerators: that
# version is an 80-step scan whose per-chunk one-hot transients and
# dynamic-slice image-gradient accumulation dominate (measured ~8.5 ms of
# the 10 ms fwd+bwd warp at 448x320 b8).
#
# Per (batch, row-tile, column-chunk) cell, with the window win (C,VW,SW)
# DMA'd exactly as in the forward, cotangent tile g (C,RT,CK):
#   t    = vt ⊗ g                  (VPU outer)          (C·VW, CK)
#   dwin += t @ ohtᵀ               (MXU)                (C·VW, SW)
#   r    = winᵀ @ t                (MXU)                (SW, CK)
#   du   = Σ_s (oh_hi - oh_lo)·r   (VPU reduce)         (CK,)
#   hsel = win @ oht               (MXU, = forward's)   (C·VW, CK)
#   dv   = Σ_v (vt_hi - vt_lo)·Σ_c g·hsel               (CK,)
# dwin accumulates into a per-batch-item dimg block that stays VMEM-resident
# across the (row-tile, chunk) grid dims (revisited output block) — no
# scatter primitive, no HBM round-trips per cell.
#
# Derivative convention matches autodiff of the exact gather formulation
# (flow_warp_layer.cpp:119-195): taps at (xb, xb+1) with xb = min(floor(x2c),
# W-2), so the x2 == W-1 boundary differentiates as img[W-1] - img[W-2].
# Out-of-budget pixels clamp xb to the window edge but keep their fractional
# derivative — the same contract as the XLA hand-backward.


def _warp_bwd_kernel(
    x0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window column bases
    y0_ref,  # (n*nt*nc,) SMEM scalar-prefetch: window row bases
    xb_ref,  # (1, RT, CK) VMEM f32: integer tap base min(floor(x2c), W-2)
    ax_ref,  # (1, RT, CK) VMEM f32: x fraction in [0, 1]
    yb_ref,  # (1, RT, CK) VMEM f32
    ay_ref,  # (1, RT, CK) VMEM f32
    g_ref,  # (1, C, RT, CK) VMEM: cotangent (zeroed outside `valid`)
    img_ref,  # (N, C, Hp, Wp) ANY/HBM
    dimg_ref,  # (1, C, Him, Wim) VMEM f32 out — revisited across (t, k)
    du_ref,  # (1, RT, CK) VMEM f32 out
    dv_ref,  # (1, RT, CK) VMEM f32 out
    win_ref,  # (2, C, VW, SW) VMEM scratch (double-buffered)
    sem,
    *,
    channels: int,
    ck: int,
    sw: int,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    k = pl.program_id(2)
    nt_g = pl.num_programs(1)
    nc_g = pl.num_programs(2)
    cell = (b * nt_g + t) * nc_g + k
    ncells = pl.num_programs(0) * nt_g * nc_g

    def dma(slot, ci):
        x0 = pl.multiple_of(x0_ref[ci], 128)
        y0 = pl.multiple_of(y0_ref[ci], 8)
        bi = ci // (nt_g * nc_g)
        return pltpu.make_async_copy(
            img_ref.at[bi, :, pl.ds(y0, VW), pl.ds(x0, sw)],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(cell == 0)
    def _():
        dma(0, 0).start()

    @pl.when(cell + 1 < ncells)
    def _():
        dma((cell + 1) % 2, cell + 1).start()

    @pl.when(jnp.logical_and(t == 0, k == 0))
    def _():
        dimg_ref[...] = jnp.zeros(dimg_ref.shape, dimg_ref.dtype)

    c = channels
    s_iota = lax.broadcasted_iota(jnp.int32, (sw, ck), 0).astype(jnp.float32)
    v_iota = lax.broadcasted_iota(jnp.int32, (VW, ck), 0).astype(jnp.float32)

    dma(cell % 2, cell).wait()
    x0 = pl.multiple_of(x0_ref[cell], 128)
    y0 = pl.multiple_of(y0_ref[cell], 8)
    x0f = x0.astype(jnp.float32)
    y0f = y0.astype(jnp.float32)
    win = win_ref[cell % 2].reshape(c * VW, sw)
    mm = win.dtype
    # see _warp_kernel: exact f32 pass-through under one-hot weights
    prec = lax.Precision.HIGHEST if mm == jnp.float32 else None

    dwin = jnp.zeros((c * VW, sw), jnp.float32)
    for r in range(RT):
        xbr = jnp.clip(xb_ref[0, r, :] - x0f, 0.0, sw - 2)  # (CK,)
        ybr = jnp.clip(yb_ref[0, r, :] - y0f, 0.0, VW - 2)
        axr = ax_ref[0, r, :]
        ayr = ay_ref[0, r, :]
        oh_lo = (s_iota == xbr[None, :]).astype(jnp.float32)  # (SW, CK)
        oh_hi = (s_iota == xbr[None, :] + 1.0).astype(jnp.float32)
        oht = oh_lo * (1.0 - axr[None, :]) + oh_hi * axr[None, :]
        vt_lo = (v_iota == ybr[None, :]).astype(jnp.float32)  # (VW, CK)
        vt_hi = (v_iota == ybr[None, :] + 1.0).astype(jnp.float32)
        vt = vt_lo * (1.0 - ayr[None, :]) + vt_hi * ayr[None, :]
        gr = g_ref[0, :, r, :].astype(jnp.float32)  # (C, CK)
        tck = (vt[None] * gr[:, None, :]).reshape(c * VW, ck).astype(mm)
        dwin = dwin + lax.dot_general(
            tck, oht.astype(mm),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (C·VW, SW)
        rsk = lax.dot_general(
            win, tck,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )  # (SW, CK)
        du_ref[0, r, :] = jnp.sum(rsk * (oh_hi - oh_lo), axis=0)
        hsel = lax.dot_general(
            win, oht.astype(mm),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        ).reshape(c, VW, ck)
        e = jnp.sum(hsel * gr[:, None, :], axis=0)  # (VW, CK)
        dv_ref[0, r, :] = jnp.sum(e * (vt_hi - vt_lo), axis=0)

    dw3 = dwin.reshape(c, VW, sw)
    cur = dimg_ref[0, :, pl.ds(y0, VW), pl.ds(x0, sw)]
    dimg_ref[0, :, pl.ds(y0, VW), pl.ds(x0, sw)] = cur + dw3


def flow_warp_pallas_bwd(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    g: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """VJP of flow_warp_pallas: (image, flow, cotangent) -> (dimg, dflow).

    Window bases and tile geometry are recomputed EXACTLY as in the forward,
    so within the documented flow-variation budget this is the true VJP of
    the Pallas forward AND of the exact gather formulation.
    """
    n, h, w, c = image.shape
    orig_dtype = image.dtype
    cdtype = jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    x2c = jnp.clip(x2, 0.0, w - 1)
    y2c = jnp.clip(y2, 0.0, h - 1)
    xb = jnp.minimum(jnp.floor(x2c), w - 2)
    yb = jnp.minimum(jnp.floor(y2c), h - 2)
    ax = jnp.clip(x2c - xb, 0.0, 1.0)
    ay = jnp.clip(y2c - yb, 0.0, 1.0)
    # clip chain: flow grads vanish once x2/y2 leaves [0, size-1]
    dumask = ((x2 >= 0) & (x2 <= w - 1)).astype(jnp.float32)
    dvmask = ((y2 >= 0) & (y2 <= h - 1)).astype(jnp.float32)
    g_eff = jnp.where(valid[..., None], g.astype(cdtype), 0)

    ck, sw, wim = _geometry(w)
    hp = -(-h // RT) * RT
    wp = -(-w // ck) * ck
    pad2 = ((0, 0), (0, hp - h), (0, wp - w))
    big = float(2 * max(h, w))
    # Window bases: SAME inputs and formula as the forward (continuous
    # clamped coords, large pads, aligned down, clamped into the image).
    xcp = jnp.pad(x2c, pad2, constant_values=big)
    ycp = jnp.pad(y2c, pad2, constant_values=big)
    nt, nc = hp // RT, wp // ck
    him = max(-(-max(h, VW) // 8) * 8, VW)
    x0 = jnp.min(xcp.reshape(n, nt, RT, nc, ck), axis=(2, 4)).astype(jnp.int32)
    y0 = jnp.min(ycp.reshape(n, nt, RT, nc, ck), axis=(2, 4)).astype(jnp.int32)
    x0 = jnp.clip(x0 // 128 * 128, 0, wim - sw).reshape(-1)
    y0 = jnp.clip(y0 // 8 * 8, 0, him - VW).reshape(-1)

    # Tap bases pad with `big` (clamp to the window edge; their g is zero),
    # fractions/cotangent pad with zeros.
    xbp = jnp.pad(xb, pad2, constant_values=big)
    ybp = jnp.pad(yb, pad2, constant_values=big)
    axp = jnp.pad(ax, pad2)
    ayp = jnp.pad(ay, pad2)
    gT = jnp.pad(
        jnp.transpose(g_eff, (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, hp - h), (0, wp - w)),
    )
    imgT = jnp.pad(
        jnp.transpose(image.astype(cdtype), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, him - h), (0, wim - w)),
    )

    coord_spec = pl.BlockSpec(
        (1, RT, ck), lambda b, t, k, x0, y0: (b, t, k), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nt, nc),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (1, c, RT, ck),
                lambda b, t, k, x0, y0: (b, 0, t, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, c, him, wim),
                lambda b, t, k, x0, y0: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, ck), lambda b, t, k, x0, y0: (b, t, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RT, ck), lambda b, t, k, x0, y0: (b, t, k),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c, VW, sw), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dimgT, du, dv = pl.pallas_call(
        partial(_warp_bwd_kernel, channels=c, ck=ck, sw=sw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, c, him, wim), jnp.float32),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(x0, y0, xbp, axp, ybp, ayp, gT, imgT)

    dimg = jnp.transpose(dimgT, (0, 2, 3, 1))[:, :h, :w].astype(orig_dtype)
    dflow = jnp.stack(
        [du[:, :h, :w] * dumask, dv[:, :h, :w] * dvmask], axis=-1
    ).astype(flow.dtype)
    return dimg, dflow
