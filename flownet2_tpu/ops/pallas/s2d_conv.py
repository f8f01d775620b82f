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
    *refs,
    wk: int,
    shift: int,
    phases: int,
    wout: int,
    cout: int,
    bs: int,
    tap_dma: bool,
):
    # refs: nshift x_refs (B, Hp, Wp, C) ANY/HBM (tap_dma: input pre-shifted
    # by bb columns so DMA offsets stay 8-aligned — Mosaic rejects unaligned
    # HBM slices on the sublane dim), then w_ref (wk*wk, C, Nall) VMEM,
    # b_ref (1, Nall) VMEM, out_ref (1, BS, Wout, phases*Cout) VMEM,
    # win_ref (2[, wk], rows+wk-1, Wp, C) VMEM scratch (double-buffered),
    # co_ref (rows, Wctp, Nall) VMEM scratch, dma sem.
    nshift = wk if tap_dma else 1
    x_refs = refs[:nshift]
    w_ref, b_ref, out_ref, win_ref, co_ref, sem = refs[nshift:]
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    kc = pl.program_id(2)
    rows = co_ref.shape[0]  # = bs + shift rounded to RG (bs chosen so exact)
    wctp = co_ref.shape[1]  # 8-aligned >= col-block + shift
    rows_in = win_ref.shape[-3]
    cols_in = win_ref.shape[-2]
    nall = w_ref.shape[2]
    c = win_ref.shape[-1]
    cb = wout  # output columns per block

    # Double-buffered window DMA across grid cells (row x column blocks):
    # prefetch cell i+1's window while computing cell i (the serial variant
    # left the MXU idle for the full HBM fetch — up to 4.6 MB/cell).
    # tap_dma: additionally land the wk column-shifted window copies (from
    # the pre-shifted inputs) so every tap matmul below slices at sublane
    # offset 0 — the per-tap unaligned slice otherwise costs a full
    # (RG, wctp, C) relayout per tap per row group; the shifted copies move
    # that work onto the DMA engines where it overlaps compute.
    nt_g = pl.num_programs(1)
    nk_g = pl.num_programs(2)
    i = (bidx * nt_g + t) * nk_g + kc

    def dma(slot, bi, ti, ki, bb=0):
        if tap_dma:
            dst, s = win_ref.at[slot, bb], sem.at[slot, bb]
        else:
            dst, s = win_ref.at[slot], sem.at[slot]
        return pltpu.make_async_copy(
            x_refs[bb].at[bi, pl.ds(ti * bs, rows_in), pl.ds(ki * cb, cols_in)],
            dst,
            s,
        )

    nshift = wk if tap_dma else 1

    @pl.when(i == 0)
    def _():
        for bb in range(nshift):
            dma(0, bidx, t, kc, bb).start()

    k1 = kc + 1
    t1 = jnp.where(k1 == nk_g, t + 1, t)
    kn = jnp.where(k1 == nk_g, 0, k1)
    bn = jnp.where(t1 == nt_g, bidx + 1, bidx)
    tn = jnp.where(t1 == nt_g, 0, t1)

    @pl.when(i + 1 < pl.num_programs(0) * nt_g * nk_g)
    def _():
        for bb in range(nshift):
            dma((i + 1) % 2, bn, tn, kn, bb).start()

    for bb in range(nshift):
        dma(i % 2, bidx, t, kc, bb).wait()
    slot = i % 2

    bias = b_ref[0].astype(jnp.float32)
    # Row-grouped tap accumulation: per RG output rows, each of the wk² taps
    # is ONE (RG·wctp, C)·(C, Nall) MXU matmul — big enough to amortize the
    # MXU pipeline (a per-row variant at M=wctp measured 1.5-2x slower).
    for g in range(rows // RG):
        acc = jnp.zeros((RG * wctp, nall), jnp.float32)
        for a in range(wk):
            for bb in range(wk):
                if tap_dma:
                    seg = win_ref[slot, bb, pl.ds(g * RG + a, RG), pl.ds(0, wctp), :]
                else:
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
    tap_dma: bool = False,
) -> jnp.ndarray:
    """Merged conv on a PRE-PADDED input.

    xp: (B, Hp, Wp, C) with Hp >= out_rows + wk - 1 + shift and
    Wp >= out_cols + wk - 1 + shift; wm: (wk, wk, C, Nall); bias: (Nall,).
    Returns (B, out_rows, out_cols, Nall) — with phases=4, Nall = 4·Cout in
    phase-major s2d layout, where phase (di,dj) reads the conv grid at
    (+di·shift, +dj·shift).

    tap_dma=True lands wk column-shifted window copies per cell (×wk DMA
    traffic) so tap matmuls slice sublane-aligned — see _kernel.
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
    # Column block: largest cb <= 256 whose total per-cell VMEM footprint
    # (double-buffered window incl. tap copies + co scratch + pipelined out
    # blocks + weights) fits the 16 MB scoped limit with ~2.5 MB headroom
    # for Mosaic's fixed overhead. The previous window-only 9.5 MB budget
    # OOMed once tap_dma multiplied the window by wk (17.63M at the
    # Sintel-width wk=2 deconv). The model counts what Mosaic ALLOCATES,
    # not the logical shapes: the last dim tiles to 128 lanes (Nall=64
    # fusion blocks occupy 128) and the second-to-last to the sublane
    # tile (16 for bf16, 8 for f32).
    ebytes = 2 if cdtype == jnp.bfloat16 else 4
    nshift = wk if tap_dma else 1
    sub = 16 if ebytes == 2 else 8
    nall_p = -(-nall // 128) * 128

    def _footprint(cb_: int) -> int:
        wctp_ = -(-(cb_ + shift) // 8) * 8
        cols_ = -(-(wctp_ + wk - 1) // sub) * sub
        win = 2 * nshift * (rows + wk - 1) * cols_ * cpad * ebytes
        co = rows * (-(-wctp_ // sub) * sub) * nall_p * ebytes
        outb = 2 * bs * (-(-cb_ // sub) * sub) * nall_p * ebytes
        wvm = 2 * wk * wk * cpad * nall_p * ebytes
        return win + co + outb + wvm

    cb = min(256, -(-out_cols // 8) * 8)
    while cb > 64 and _footprint(cb) > 13_500_000:
        cb -= 8
    nk = -(-out_cols // cb)
    wctp = -(-(cb + shift) // 8) * 8  # co width per block, 8-aligned

    # Input alignment for the block DMA: W (sublanes) to 8 with room for
    # the bb-shifted wctp slices in the LAST column block, C (lanes) to
    # 128 (zero-weight pads). With tap_dma the shifted copies read the full
    # 8-aligned cols_in window at source offset +bb, so the pad must cover
    # cols_in + (nshift-1) — pl.ds CLAMPS out-of-range starts, which would
    # silently alias copy bb to copy 0.
    cols_in = -(-(wctp + wk - 1) // 8) * 8
    hpad = nt * bs + wk - 1 + shift
    wpad = max(-(-wp // 8) * 8, (nk - 1) * cb + cols_in + nshift - 1)
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
    # tap_dma: pre-shifted input copies (one per column tap) so the kernel's
    # window DMAs read 8-aligned sublane offsets — Mosaic cannot slice HBM
    # at unaligned sublane starts. XLA materializes each shift as one copy.
    xs = [xp]
    for bb in range(1, nshift):
        xs.append(jnp.pad(xp[:, :, bb:], ((0, 0), (0, 0), (0, bb), (0, 0))))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nt, nk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * nshift
        + [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bs, cb, nall), lambda bi, t, ki: (bi, t, ki, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, wk, rows + wk - 1, cols_in, c) if tap_dma
                else (2, rows + wk - 1, cols_in, c),
                cdtype,
            ),
            # co holds the biased (pre-phase-extraction) result in the
            # OUTPUT dtype — f32 here pushed conv0's Sintel-width cell over
            # the 16 MB VMEM limit; accumulation stays f32 in `acc`.
            pltpu.VMEM((rows, wctp, nall), cdtype),
            pltpu.SemaphoreType.DMA((2, wk) if tap_dma else (2,)),
        ],
    )
    out = pl.pallas_call(
        partial(
            _kernel, wk=wk, shift=shift, phases=phases, wout=cb,
            cout=cout, bs=bs, tap_dma=tap_dma,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, nt * bs, nk * cb, nall), cdtype),
        interpret=interpret,
    )(*xs, w2.astype(cdtype), bias.astype(jnp.float32)[None, :])
    return out[:, :out_rows, :out_cols]
