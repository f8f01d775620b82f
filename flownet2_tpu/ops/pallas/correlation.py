"""Fused Pallas TPU kernel for the 2-D correlation cost volume.

Replaces the reference's shared-memory CUDA kernel (correlation_layer.cu:
46-114) — shared-memory patch caching maps to VMEM-resident tiles here. The
kernel handles the geometry class the FlowNet family uses: kernel_size=1,
stride1=1, pad == max_displacement (output resolution == input resolution);
``flownet2_tpu.ops.correlation.correlation`` remains the general/reference
path and the autodiff rule.

Layout: one grid step per (batch, h-tile). The f1 tile streams in via the
standard block pipeline; the padded f2 halo window (TH + 2·md rows) is
DMA'd from HBM into VMEM scratch explicitly because it overlaps between
adjacent h-tiles (BlockSpec windows cannot overlap). The displacement loops
are fully unrolled: per (dy, dx), a shifted VMEM slice of f2 is multiplied
with the f1 tile and channel-reduced on the VPU with f32 accumulation —
441 fused multiply-reduce sweeps per tile.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(
    f1_ref,  # (1, TH, W, C) VMEM
    f2p_hbm,  # (B, H + 2md, SW, C) HBM/ANY (SW = alignment-padded width)
    out_ref,  # (1, gw*gw, TH, W) VMEM — displacement-major so the inner
    #            loop's store index lands on a leading dim, not the lanes
    f2_scratch,  # (TH + 2md, SW, C) VMEM
    dma_sem,
    *,
    md: int,
    stride2: int,
    th: int,
    width: int,
    channels: int,
    win_w: int,
):
    b = pl.program_id(0)
    ht = pl.program_id(1)
    gr = md // stride2
    gw = 2 * gr + 1

    # Halo window: rows [ht*TH, ht*TH + TH + 2md) of padded f2.
    copy = pltpu.make_async_copy(
        f2p_hbm.at[b, pl.ds(ht * th, th + 2 * md)],
        f2_scratch,
        dma_sem,
    )
    copy.start()

    f1 = f1_ref[0].astype(jnp.float32)  # (TH, W, C)
    copy.wait()

    inv_norm = 1.0 / channels
    # Column (sublane-dim) offsets must be 8-aligned for vector loads, so
    # each displacement loads an aligned window of win_w (= W rounded up + 8)
    # and rotates the residue away. Residues are the multiples of
    # gcd(stride2, 8) below 8; branch index = residue // gcd.
    g = math.gcd(stride2, 8)
    residues = list(range(0, 8, g))

    def body(d, _):
        p = d // gw
        o = d - p * gw
        off = o * stride2
        off0 = pl.multiple_of((off // 8) * 8, 8)
        window = f2_scratch[
            pl.ds(p * stride2, th), pl.ds(off0, win_w), :
        ].astype(jnp.float32)

        def make_branch(r):
            def branch():
                # left-rotate by r == roll right by win_w - r (pltpu.roll
                # requires non-negative shifts)
                rolled = pltpu.roll(window, win_w - r, 1) if r else window
                return rolled[:, :width, :]

            return branch

        if len(residues) == 1:
            sh = make_branch(residues[0])()
        else:
            pos = (off - off0) // g
            sh = jax.lax.switch(pos, [make_branch(r) for r in residues])
        q = jnp.sum(f1 * sh, axis=-1) * inv_norm  # (TH, W)
        out_ref[0, d] = q.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, gw * gw, body, 0)


@partial(jax.jit, static_argnames=("max_displacement", "stride2", "interpret"))
def correlation_pallas(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    *,
    max_displacement: int = 20,
    stride2: int = 2,
    interpret: bool = False,
) -> jnp.ndarray:
    """FlowNet-class correlation: kernel=1, stride1=1, pad=max_displacement.

    f1/f2: (B, H, W, C) → (B, H, W, gw²) with gw = 2*(md//stride2)+1.
    """
    b, h, w, c = f1.shape
    md = max_displacement
    gr = md // stride2
    gw = 2 * gr + 1

    # Aligned-window geometry: per displacement the kernel loads win_w
    # columns starting at an 8-aligned offset ≤ 2·md, so the padded width
    # must reach max_aligned_offset + win_w.
    win_w = ((w + 7) // 8) * 8 + 8
    max_off0 = ((2 * md) // 8) * 8
    sw = max(max_off0 + win_w, w + 2 * md)
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, sw - w - md), (0, 0)))

    # Pick an h-tile that divides H and keeps scratch + blocks within ~10MB.
    bytes_per = f2.dtype.itemsize

    def vmem_use(th_):
        scratch = (th_ + 2 * md) * sw * c * bytes_per
        f1_blk = th_ * w * c * bytes_per
        out_blk = th_ * w * gw * gw * f1.dtype.itemsize
        return 2 * (f1_blk + out_blk) + scratch  # blocks double-buffered

    # Mosaic requires block sublane dims ≡ 0 (mod 8) or == the full dim, so
    # candidate tiles are h itself plus 8-multiples dividing h, largest first.
    candidates = [h] + [t for t in range(8 * (h // 8), 7, -8) if h % t == 0]
    th = None
    for t in candidates:
        if vmem_use(t) <= 10 * 1024 * 1024:
            th = t
            break
    if th is None:
        raise ValueError(
            f"correlation_pallas: no feasible tiling for shape {f1.shape}"
        )

    grid = (b, h // th)
    kernel = partial(
        _corr_kernel, md=md, stride2=stride2, th=th, width=w, channels=c, win_w=win_w
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, th, w, c), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, gw * gw, th, w), lambda bi, hi: (bi, 0, hi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, gw * gw, h, w), f1.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * md, sw, c), f2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(f1, f2p)
    # displacement-major → NHWC for the consuming convs
    return jnp.transpose(out, (0, 2, 3, 1))
