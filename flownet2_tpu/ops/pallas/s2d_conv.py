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
    kc = pl.program_id(2)
    rows = co_ref.shape[0]  # = bs + shift rounded to RG (bs chosen so exact)
    wctp = co_ref.shape[1]  # 8-aligned >= col-block + shift
    rows_in = win_ref.shape[1]
    cols_in = win_ref.shape[2]
    nall = w_ref.shape[2]
    c = win_ref.shape[3]
    cb = wout  # output columns per block

    # Double-buffered window DMA across grid cells (row x column blocks):
    # prefetch cell i+1's window while computing cell i (the serial variant
    # left the MXU idle for the full HBM fetch — up to 4.6 MB/cell).
    nt_g = pl.num_programs(1)
    nk_g = pl.num_programs(2)
    i = (bidx * nt_g + t) * nk_g + kc

    def dma(slot, bi, ti, ki):
        return pltpu.make_async_copy(
            x_ref.at[bi, pl.ds(ti * bs, rows_in), pl.ds(ki * cb, cols_in)],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, bidx, t, kc).start()

    k1 = kc + 1
    t1 = jnp.where(k1 == nk_g, t + 1, t)
    kn = jnp.where(k1 == nk_g, 0, k1)
    bn = jnp.where(t1 == nt_g, bidx + 1, bidx)
    tn = jnp.where(t1 == nt_g, 0, t1)

    @pl.when(i + 1 < pl.num_programs(0) * nt_g * nk_g)
    def _():
        dma((i + 1) % 2, bn, tn, kn).start()

    dma(i % 2, bidx, t, kc).wait()
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
        co_ref[pl.ds(g * RG, RG)] = (
            (acc + bias[None, :]).reshape(RG, wctp, nall).astype(co_ref.dtype)
        )

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

    # Block sizes: bs + shift must be a multiple of RG so the row-grouped
    # matmuls cover exactly the co rows needed (no wasted compute); columns
    # block at <=256 so the per-cell VMEM footprint stays inside ~13 MB at
    # Sintel-width inputs (a full 512-col block OOMs VMEM).
    bs = 3 * RG - shift
    rows = bs + shift
    nt = -(-out_rows // bs)
    cpad = -(-c // 128) * 128
    # Budget the double-buffered window to ~9.5 MB so the cell (window +
    # co + out blocks) stays inside the 16 MB VMEM limit at any C.
    ebytes = 2 if cdtype == jnp.bfloat16 else 4
    percol = 2 * (rows + wk - 1) * cpad * ebytes
    cb = max(64, min(256, (9_500_000 // percol - wk - shift) // 8 * 8))
    cb = min(cb, -(-out_cols // 8) * 8)
    nk = -(-out_cols // cb)
    wctp = -(-(cb + shift) // 8) * 8  # co width per block, 8-aligned

    # Input alignment for the block DMA: W (sublanes) to 8 with room for
    # the bb-shifted wctp slices in the LAST column block, C (lanes) to
    # 128 (zero-weight pads).
    hpad = nt * bs + wk - 1 + shift
    wpad = max(-(-wp // 8) * 8, (nk - 1) * cb + wctp + wk - 1)
    wpad = -(-wpad // 8) * 8
    if hp < hpad or wp < wpad or c < cpad:
        xp = jnp.pad(
            xp,
            ((0, 0), (0, max(0, hpad - hp)), (0, wpad - wp), (0, cpad - c)),
        )
    if c < cpad:
        wm = jnp.pad(wm, ((0, 0), (0, 0), (0, cpad - c), (0, 0)))
        c = cpad

    w2 = wm.reshape(wk * wk, c, nall)
    cols_in = wctp + wk - 1
    cols_in = -(-cols_in // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nt, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, cb, nall), lambda bi, t, ki: (bi, t, ki, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows + wk - 1, cols_in, c), cdtype),
            # co holds the biased (pre-phase-extraction) result in the
            # OUTPUT dtype — f32 here pushed conv0's Sintel-width cell over
            # the 16 MB VMEM limit; accumulation stays f32 in `acc`.
            pltpu.VMEM((rows, wctp, nall), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _kernel, wk=wk, shift=shift, phases=phases, wout=cb,
            cout=cout, bs=bs,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt * bs, nk * cb, nall), cdtype),
        interpret=interpret,
    )(xp, w2.astype(cdtype), bias.astype(jnp.float32)[None, :])
    return out[:, :out_rows, :out_cols]
