"""Fused Pallas TPU kernel for small-window convolutions in the s2d domain.

The fusion net's space-to-depth rewrites (ops/s2d.py) turn full-resolution
low-channel convs into wk∈{2,3} convs with K = wk²·4·Cin contraction depth —
MXU-shaped — but XLA's lowering loses the win to phase-grid slice relayouts
and per-phase lane-starved convs (fusion net measured 8% MFU while every
other cascade stage runs 25-30%). This kernel computes the merged conv as
tap-accumulated row matmuls entirely in VMEM and extracts the phase grid in
registers, so the relayouts never exist:

  per grid cell (batch item, row block): DMA the input rows + halo; for
  each output-grid row, accumulate wk² matmuls (W+shift, Cin)·(Cin, Nall)
  in f32; then write phase (di,dj) as the lane-concat of shifted row/col
  slices — the canonical phase-major s2d channel layout.

One kernel covers the three shapes the s2d domain needs:
  - stride-1 s2d conv  (phases=4, shift∈{0,1}): out (B, H, W, 4·Cout)
  - s2d deconv k4/s2   (phases=4, shift=1, wk=2 on 1-padded plain input)
  - plain VALID conv   (phases=1, shift=0): stride-2 s2d convs and any
    odd-k stride-1 conv (wk=k, input pre-padded by k//2)

Forward only — callers wire a custom VJP whose backward runs the XLA
formulation (exact same math; see ops/s2d.py routing).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RG = 8  # sublane row group: M = RG * width per matmul


def _kernel(
    x_ref,  # (B, Hp, Wp, C) ANY/HBM — pre-padded input
    w_ref,  # (wk*wk, C, Nall) VMEM
    b_ref,  # (1, Nall) VMEM
    out_ref,  # (1, BS, Wout, phases*Cout) VMEM
    win_ref,  # (2, rows + wk - 1, Wp, C) VMEM scratch (double-buffered)
    co_ref,  # (rows, Wctp, Nall) VMEM scratch (f32)
    sem,
    *,
    wk: int,
    shift: int,
    phases: int,
    wout: int,
    cout: int,
    bs: int,
):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    rows = co_ref.shape[0]  # = bs + shift rounded to RG (bs chosen so exact)
    wctp = co_ref.shape[1]  # 8-aligned >= wout + shift
    rows_in = win_ref.shape[1]
    nall = w_ref.shape[2]
    c = win_ref.shape[3]

    # Double-buffered window DMA across grid cells: prefetch cell i+1's
    # rows while computing cell i (the serial variant left the MXU idle
    # for the full HBM fetch — up to 4.6 MB/cell).
    nt_g = pl.num_programs(1)
    i = bidx * nt_g + t

    def dma(slot, bi, ti):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ti * bs, rows_in)], win_ref.at[slot], sem.at[slot]
        )

    @pl.when(i == 0)
    def _():
        dma(0, bidx, t).start()

    t1 = t + 1
    bn = jnp.where(t1 == nt_g, bidx + 1, bidx)
    tn = jnp.where(t1 == nt_g, 0, t1)

    @pl.when(i + 1 < pl.num_programs(0) * nt_g)
    def _():
        dma((i + 1) % 2, bn, tn).start()

    dma(i % 2, bidx, t).wait()
    slot = i % 2

    bias = b_ref[0].astype(jnp.float32)
    # Row-grouped tap accumulation: per RG output rows, each of the wk² taps
    # is ONE (RG·wctp, C)·(C, Nall) MXU matmul — big enough to amortize the
    # MXU pipeline (a per-row variant at M=wctp measured 1.5-2x slower).
    for g in range(rows // RG):
        acc = jnp.zeros((RG * wctp, nall), jnp.float32)
        for a in range(wk):
            for bb in range(wk):
                seg = win_ref[slot, pl.ds(g * RG + a, RG), pl.ds(bb, wctp), :]
                acc = acc + jax.lax.dot_general(
                    seg.reshape(RG * wctp, c),
                    w_ref[a * wk + bb],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        co_ref[pl.ds(g * RG, RG)] = (acc + bias[None, :]).reshape(RG, wctp, nall)

    if phases == 1:
        out_ref[0] = co_ref[pl.ds(0, bs), pl.ds(0, wout), :].astype(out_ref.dtype)
        return

    # Phase extraction: out[y, x, (di*2+dj)*cout + c] = co[y + di*shift,
    # x + dj*shift, (di*2+dj)*cout + c] — ONE 3-D slice copy per phase
    # (a per-row store loop measured ~18 us/cell of pure store overhead;
    # Mosaic also cannot lane-concat slices with mismatched sublane
    # offsets, hence stores instead of a concat).
    for di in range(2):
        for dj in range(2):
            ph = di * 2 + dj
            out_ref[0, :, :, ph * cout : (ph + 1) * cout] = co_ref[
                pl.ds(di * shift, bs), pl.ds(dj * shift, wout),
                ph * cout : (ph + 1) * cout,
            ].astype(out_ref.dtype)


def matmul_conv_pallas(
    xp: jnp.ndarray,
    wm: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    shift: int,
    phases: int,
    out_rows: int,
    out_cols: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Merged conv on a PRE-PADDED input.

    xp: (B, Hp, Wp, C) with Hp >= out_rows + wk - 1 + shift and
    Wp >= out_cols + wk - 1 + shift; wm: (wk, wk, C, Nall); bias: (Nall,).
    Returns (B, out_rows, out_cols, Nall) — with phases=4, Nall = 4·Cout in
    phase-major s2d layout, where phase (di,dj) reads the conv grid at
    (+di·shift, +dj·shift).
    """
    b, hp, wp, c = xp.shape
    wk = wm.shape[0]
    nall = wm.shape[3]
    cout = nall // phases if phases == 4 else nall
    cdtype = xp.dtype

    # Block size: bs + shift must be a multiple of RG so the row-grouped
    # matmuls cover exactly the co rows needed (no wasted compute).
    bs = 3 * RG - shift
    rows = bs + shift
    nt = -(-out_rows // bs)
    wctp = -(-(out_cols + shift) // 8) * 8  # co width, 8-aligned sublanes

    # Input alignment for the row-block DMA: W (sublanes) to 8 with room
    # for the bb-shifted wctp slices, C (lanes) to 128 (zero-weight pads).
    hpad = nt * bs + wk - 1 + shift
    wpad = max(-(-wp // 8) * 8, wctp + wk - 1)
    wpad = -(-wpad // 8) * 8
    cpad = -(-c // 128) * 128
    if hp < hpad or wp < wpad or c < cpad:
        xp = jnp.pad(
            xp,
            ((0, 0), (0, max(0, hpad - hp)), (0, wpad - wp), (0, cpad - c)),
        )
    if c < cpad:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
        c = cpad

    w2 = wm.reshape(wk * wk, c, nall)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, out_cols, nall), lambda bi, t: (bi, t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows + wk - 1, xp.shape[2], c), cdtype),
            pltpu.VMEM((rows, wctp, nall), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _kernel, wk=wk, shift=shift, phases=phases, wout=out_cols,
            cout=cout, bs=bs,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt * bs, out_cols, nall), cdtype),
        interpret=interpret,
    )(xp, w2.astype(cdtype), bias.astype(jnp.float32)[None, :])
    return out[:, :out_rows]
