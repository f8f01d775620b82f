"""Space-to-depth execution domain for full-resolution convolutions.

XLA-TPU convolutions at full resolution with few channels run at a fixed
~1.5-2.7 ms each on v5e (8×320×448): channel counts below the 128-lane tile
waste the MXU and the relayouts dominate (measured: conv3x3 82→Cout takes
the same time for Cout=16 and Cout=128). The classic TPU fix is to fold 2×2
spatial blocks into channels (space-to-depth) and rewrite each conv into an
EXACT equivalent on the folded tensor:

  - stride-1 k×k conv  →  (r+1)×(r+1) block conv producing all 4 output
    phases as channels, evaluated once on a 1-block-padded input and
    phase-aligned with shifted slices (no gather; r = (k-1)/2);
  - stride-2 k×k conv  →  (r+1)×(r+1) block conv producing the plain
    half-res output directly (leaving the s2d domain);
  - k=4/s=2 deconv     →  one 2×2 VALID conv whose 4 phase outputs ARE the
    s2d channels (the pixel-shuffle algebra of ops.conv.deconv2d_ps, minus
    the final depth-to-space).

The rewrites recover 50-100 TFLOP/s on the same layers (measured: fusion
inter_conv0 2.74→~1.0 ms, conv0 1.67→0.55 ms). Weight remapping happens
inside jit on the original parameter pytrees (tiny tensors, no param
duplication), so checkpoints/importers are unaffected.

Phase layout convention: channel block (di*2+dj) holds phase (row parity di,
col parity dj): s2d(x)[b, m, n, (di*2+dj)*C + c] = x[b, 2m+di, 2n+dj, c].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4C); H, W must be even."""
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"space_to_depth needs even dims, got {h}x{w}")
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H2, W2, 4C) → (B, 2H2, 2W2, C)."""
    n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h2, w2, 2, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, 2 * h2, 2 * w2, c)


def _block_geometry(k: int):
    """(r, block window w_k, pad p, per-dim phase shift)."""
    r = (k - 1) // 2
    wk = r + 1
    p = -((-r) // 2)  # ceil(r/2)
    shift = 1 if r % 2 else 0
    return r, wk, p, shift


def _remap_weights_s1(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,Cin,Cout) → (wk,wk,4Cin,4Cout) for the stride-1 s2d conv.

    Output channel block (di*2+dj); tap (dy,dx) of phase (di,dj) lands at
    window position a = floor((di+dy)/2) - (di*shift - p), input phase
    py = (di+dy) % 2 (and the x analogues).
    """
    k, _, cin, cout = w.shape
    r, wk, p, shift = _block_geometry(k)
    w2 = jnp.zeros((wk, wk, 4, cin, 4, cout), w.dtype)
    for di in range(2):
        for dj in range(2):
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    a = (di + dy) // 2 - (di * shift - p)
                    b = (dj + dx) // 2 - (dj * shift - p)
                    py, px = (di + dy) % 2, (dj + dx) % 2
                    w2 = w2.at[a, b, py * 2 + px, :, di * 2 + dj, :].add(
                        w[dy + r, dx + r]
                    )
    return w2.reshape(wk, wk, 4 * cin, 4 * cout)


def _remap_weights_s2(w: jnp.ndarray) -> jnp.ndarray:
    """(k,k,Cin,Cout) → (wk,wk,4Cin,Cout) for the stride-2 s2d conv."""
    k, _, cin, cout = w.shape
    r, wk, p, _ = _block_geometry(k)
    w2 = jnp.zeros((wk, wk, 4, cin, cout), w.dtype)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            a = dy // 2 + p
            b = dx // 2 + p
            py, px = dy % 2, dx % 2
            w2 = w2.at[a, b, py * 2 + px, :, :].add(w[dy + r, dx + r])
    return w2.reshape(wk, wk, 4 * cin, cout)


def _segment_permutation(segments, cin: int):
    """Input-channel permutation mapping the canonical phase-major s2d layout
    to a concat-of-s2d-tensors layout: concat([s2d(a), s2d(b)]) stores
    segment-major [a·4phases | b·4phases], while the weight remap assumes
    phase-major over the full Cin. perm[pos_in_concat] = canonical index."""
    assert sum(segments) == cin, (segments, cin)
    perm = []
    off = 0
    for cs in segments:
        for ph in range(4):
            for c in range(cs):
                perm.append(ph * cin + off + c)
        off += cs
    return jnp.asarray(perm, jnp.int32)


def _conv2d_s2d_impl(
    x2: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    segments=None,
) -> jnp.ndarray:
    """k×k (odd k, pad k//2) convolution evaluated in the s2d domain.

    x2: s2d tensor (B, H2, W2, 4Cin). stride=1 returns the s2d of the
    full-res output (B, H2, W2, 4Cout); stride=2 returns the plain half-res
    output (B, H2, W2, Cout), exiting the domain. Matches
    ops.conv.conv2d(x, w, stride=stride, padding=k//2) exactly.

    ``segments``: per-phase channel sizes when x2 is a channel-concat of
    several s2d tensors (concat does NOT commute with s2d; the weight rows
    are permuted instead of relayouting the activation).
    """
    k = w.shape[0]
    if k % 2 != 1:
        raise ValueError("conv2d_s2d supports odd kernels only")
    n, h2, w2_, _ = x2.shape
    cin = w.shape[2]
    cout = w.shape[3]
    r, wk, p, shift = _block_geometry(k)
    in_dtype = x2.dtype
    if x2.dtype != w.dtype:
        x2 = x2.astype(w.dtype)

    if stride == 2:
        xp = jnp.pad(x2, ((0, 0), (p, p), (p, p), (0, 0)))
        wm = _remap_weights_s2(w)
        if segments is not None:
            wm = wm[:, :, _segment_permutation(segments, cin), :]
        out = lax.conv_general_dilated(
            xp, wm, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if x2.dtype == jnp.float32 else None,
        )  # (B, H2 + 2p - wk + 1, ...) = (B, H2 + (1 - shift) - 1 + shift, ...)
        out = out[:, :h2, :w2_]
        if b is not None:
            out = out + b.astype(out.dtype)
        return out.astype(in_dtype)

    if stride != 1:
        raise ValueError("conv2d_s2d supports stride 1 or 2")
    wm = _remap_weights_s1(w)
    if segments is not None:
        wm = wm[:, :, _segment_permutation(segments, cin), :]
    if cout >= 32 or shift == 0:
        # The 4 phase convs each consume x2; without a barrier XLA re-fuses
        # the producer (s2d transpose / channel concat) into every conv and
        # recomputes it 4x (measured +2 ms on conv0 at 448x320 b8). The
        # merged branch below has a single consumer — no barrier there.
        x2 = lax.optimization_barrier(x2)
        # One conv per output phase with per-side padding so each output
        # lands tile-aligned at (H2, W2) — slicing a merged (H2+1, W2+1)
        # grid costs ~2.5 ms in relayouts at 448×320·b8 when Cout is large;
        # the plain channel concat below IS the canonical phase-major s2d
        # layout (no interleave). Measured conv0 (11→64): 0.78 ms vs 3.1
        # merged and 1.66 plain.
        phase_outs = []
        for di in range(2):
            for dj in range(2):
                wp_ = wm[:, :, :, (di * 2 + dj) * cout : (di * 2 + dj + 1) * cout]
                pad_y = (p - di * shift, wk - 1 - p + di * shift)
                pad_x = (p - dj * shift, wk - 1 - p + dj * shift)
                o = lax.conv_general_dilated(
                    x2, wp_, (1, 1), (pad_y, pad_x),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32 if x2.dtype == jnp.float32 else None,
                )
                if b is not None:
                    o = o + b.astype(o.dtype)
                phase_outs.append(o.astype(in_dtype))
        return jnp.concatenate(phase_outs, axis=-1)
    # Small Cout: 4 tiny convs waste the MXU lanes 4×; one merged conv with
    # 4·Cout outputs + cheap phase-aligning slices wins (inter_conv0 82→16:
    # 1.63 ms merged vs 3.19 per-phase vs 2.74 plain).
    xp = jnp.pad(x2, ((0, 0), (p, p), (p, p), (0, 0)))
    co = lax.conv_general_dilated(
        xp, wm, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x2.dtype == jnp.float32 else None,
    ).reshape(n, h2 + shift, w2_ + shift, 4, cout)
    phases = []
    for di in range(2):
        for dj in range(2):
            phases.append(co[:, di * shift : h2 + di * shift, dj * shift : w2_ + dj * shift, di * 2 + dj])
    out = jnp.concatenate(phases, axis=-1)
    if b is not None:
        out = out + jnp.tile(b, 4).astype(out.dtype)
    return out.astype(in_dtype)


def _deconv_phase_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(4,4,Cout,Cin) deconv weights → (2,2,Cin,4·Cout) merged phase-conv
    weights (the deconv2d_ps tap algebra: phase 0 uses taps (3,1), phase 1
    uses (2,0) per dimension)."""
    cin = w.shape[3]
    cout = w.shape[2]
    kidx = [[3, 1], [2, 0]]
    w_ps = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack([w[kidx[di][a], kidx[dj][bb]] for bb in range(2)], axis=0)
                    for a in range(2)
                ],
                axis=0,
            )
            for di in range(2)
            for dj in range(2)
        ],
        axis=-1,
    )  # (2, 2, Cout, Cin, 4)
    return jnp.transpose(w_ps, (0, 1, 3, 4, 2)).reshape(2, 2, cin, 4 * cout)


def _deconv2d_s2d_impl(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """k=4/s=2/p=1 deconvolution from plain half-res input (B,H2,W2,Cin) to
    the s2d of its full-res output (B,H2,W2,4Cout). Weight layout matches
    ops.conv.deconv2d: (4,4,Cout,Cin). Same algebra as deconv2d_ps with the
    final depth-to-space elided (the phase grid IS the s2d layout).

    One merged VALID 2×2 conv producing all 4·Cout phase channels, then
    phase-aligning shifted slices — the per-phase 4-conv variant ran the
    MXU at Cout (=16 for the fusion deconv0) lanes and measured 2.3 ms
    where this takes one dense conv (the deconv2d_ps structure)."""
    if w.shape[0] != 4 or w.shape[1] != 4:
        raise ValueError("deconv2d_s2d supports k=4 only")
    in_dtype = x.dtype
    if x.dtype != w.dtype:
        x = x.astype(w.dtype)
    n, h2, w2_, cin = x.shape
    cout = w.shape[2]
    w_ps = _deconv_phase_weights(w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    co = lax.conv_general_dilated(
        xp, w_ps, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    ).reshape(n, h2 + 1, w2_ + 1, 4, cout)
    # phase (di,dj) output position m uses conv position m+di / n+dj
    phases = []
    for di in range(2):
        for dj in range(2):
            o = co[:, di : h2 + di, dj : w2_ + dj, di * 2 + dj]
            if b is not None:
                o = o + b.astype(o.dtype)
            phases.append(o.astype(in_dtype))
    return jnp.concatenate(phases, axis=-1)


# -- Pallas routing ---------------------------------------------------------
# On TPU the merged convs run as the fused Pallas kernel
# (ops/pallas/s2d_conv.py): tap-accumulated row matmuls + in-register phase
# extraction. XLA keeps the backward (custom VJP below) and every
# non-accelerator/odd-geometry case.

import functools

import jax


def _pallas_ok(width: int) -> bool:
    """Width-dependent routing, measured on v5e (448x320 b8 / 1024x448 b4
    bf16): XLA's conv lowering wins at narrow s2d-domain widths (e.g.
    inter_conv0 1.5 vs 2.2 ms at W2=224) but degrades super-linearly with
    width, where the Pallas kernel scales linearly and wins on every
    fusion shape (conv0 1.8 vs 3.3, inter_conv0 4.4 vs 5.6, conv1-s2 2.3
    vs 3.0, deconv0 2.6 vs 3.2 ms at W2=512). Auto-route by width;
    FLOWNET2_TPU_S2D_CONV=pallas|xla forces either path."""
    import os

    mode = os.environ.get("FLOWNET2_TPU_S2D_CONV", "")
    if mode == "xla":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    return mode == "pallas" or width > 256


def _tap_dma() -> bool:
    """FLOWNET2_TPU_S2D_TAPDMA=1 enables the shifted-window tap DMA in the
    Pallas kernel. Default OFF: the wk shifted window copies multiply DMA
    traffic by wk, and the measured A/B (fusion net, Sintel 1024x448 b4,
    v5e) is 32-34 ms vs 23-24 ms — the relayout it removes is cheaper than
    the extra HBM bytes (DESIGN_NOTES negative-results ledger)."""
    import os

    return os.environ.get("FLOWNET2_TPU_S2D_TAPDMA", "0") == "1"


def _conv2d_s2d_xla(x2, w, b, stride, segments):
    return _conv2d_s2d_impl(x2, w, b, stride=stride, segments=segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv2d_s2d_routed(x2, w, b, stride, segments):
    from flownet2_tpu.ops.pallas.s2d_conv import matmul_conv_pallas

    k = w.shape[0]
    n, h2, w2_, _ = x2.shape
    cin = w.shape[2]
    cout = w.shape[3]
    r, wk, p, shift = _block_geometry(k)
    if stride == 2:
        wm = _remap_weights_s2(w)
        if segments is not None:
            wm = wm[:, :, _segment_permutation(segments, cin), :]
        xp = jnp.pad(x2, ((0, 0), (p, p), (p, p), (0, 0)))
        return matmul_conv_pallas(
            xp, wm, b if b is not None else jnp.zeros((cout,), jnp.float32),
            shift=0, phases=1, out_rows=h2, out_cols=w2_, tap_dma=_tap_dma(),
        )
    wm = _remap_weights_s1(w)
    if segments is not None:
        wm = wm[:, :, _segment_permutation(segments, cin), :]
    xp = jnp.pad(x2, ((0, 0), (p, p), (p, p), (0, 0)))
    bias = jnp.tile(b, 4) if b is not None else jnp.zeros((4 * cout,), jnp.float32)
    return matmul_conv_pallas(
        xp, wm, bias, shift=shift, phases=4, out_rows=h2, out_cols=w2_,
        tap_dma=_tap_dma(),
    )


def _conv2d_s2d_fwd(x2, w, b, stride, segments):
    return _conv2d_s2d_routed(x2, w, b, stride, segments), (x2, w, b)


def _conv2d_s2d_bwd(stride, segments, res, g):
    x2, w, b = res
    _, vjp = jax.vjp(
        lambda x2, w, b: _conv2d_s2d_xla(x2, w, b, stride, segments), x2, w, b
    )
    return vjp(g)


_conv2d_s2d_routed.defvjp(_conv2d_s2d_fwd, _conv2d_s2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _deconv2d_s2d_routed(x, w, b):
    from flownet2_tpu.ops.pallas.s2d_conv import matmul_conv_pallas

    n, h2, w2_, cin = x.shape
    cout = w.shape[2]
    w_ps = _deconv_phase_weights(w)  # (2, 2, Cin, 4*Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bias = jnp.tile(b, 4) if b is not None else jnp.zeros((4 * cout,), jnp.float32)
    return matmul_conv_pallas(
        xp, w_ps, bias, shift=1, phases=4, out_rows=h2, out_cols=w2_,
        tap_dma=_tap_dma(),
    )


def _deconv2d_s2d_fwd(x, w, b):
    return _deconv2d_s2d_routed(x, w, b), (x, w, b)


def _deconv2d_s2d_bwd(res, g):
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _deconv2d_s2d_impl(x, w, b), x, w, b)
    return vjp(g)


_deconv2d_s2d_routed.defvjp(_deconv2d_s2d_fwd, _deconv2d_s2d_bwd)


def conv2d_s2d(
    x2: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    *,
    stride: int = 1,
    segments=None,
) -> jnp.ndarray:
    """k×k (odd k, pad k//2) convolution evaluated in the s2d domain — see
    _conv2d_s2d_impl for the semantics. On TPU the forward runs as the
    fused Pallas kernel; the backward (and every other backend) takes the
    XLA formulation."""
    if _pallas_ok(x2.shape[2]) and b is not None:
        in_dtype = x2.dtype
        if x2.dtype != w.dtype:
            x2 = x2.astype(w.dtype)
        seg = tuple(segments) if segments is not None else None
        return _conv2d_s2d_routed(x2, w, b, stride, seg).astype(in_dtype)
    return _conv2d_s2d_impl(x2, w, b, stride=stride, segments=segments)


def deconv2d_s2d(
    x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """k=4/s=2/p=1 deconv → s2d of the full-res output — see
    _deconv2d_s2d_impl. Same Pallas/XLA routing as conv2d_s2d."""
    if _pallas_ok(x.shape[2]) and b is not None:
        in_dtype = x.dtype
        if x.dtype != w.dtype:
            x = x.astype(w.dtype)
        return _deconv2d_s2d_routed(x, w, b).astype(in_dtype)
    return _deconv2d_s2d_impl(x, w, b)


# -- Fused fusion-net decoder head (ops/pallas/fusion_head.py) --------------


def _fusion_head_xla(cat1, c0_2, p):
    """Reference composition of the five head layers (exact math of
    models/fusion._fusion_apply_s2d's tail) — the Pallas kernel's oracle,
    backward path, and non-TPU fallback."""
    from flownet2_tpu.ops.activations import leaky_relu
    from flownet2_tpu.ops.conv import conv2d

    inter1 = conv2d(cat1, p["inter_conv1"]["w"], p["inter_conv1"]["b"], padding=1)
    flow1 = conv2d(inter1, p["predict_flow1"]["w"], p["predict_flow1"]["b"], padding=1)
    up_feat = leaky_relu(_deconv2d_s2d_impl(cat1, p["deconv0"]["w"], p["deconv0"]["b"]))
    up_flow = _deconv2d_s2d_impl(
        flow1, p["upsample_flow1to0"]["w"], p["upsample_flow1to0"]["b"]
    )
    concat0 = jnp.concatenate([c0_2, up_feat, up_flow], axis=-1)
    inter0 = _conv2d_s2d_impl(
        concat0, p["inter_conv0"]["w"], p["inter_conv0"]["b"], segments=(64, 16, 2)
    )
    flow0_2 = _conv2d_s2d_impl(
        inter0, p["predict_flow0"]["w"], p["predict_flow0"]["b"]
    )
    return flow0_2, flow1


def fusion_head_ok(width: int | None = None) -> bool:
    """Opt-in gate for the fused decoder-head kernel (TPU only) — DEFAULT
    OFF. Measured on v5e (round 5, DESIGN_NOTES negative-results ledger):
    the kernel LOSES in-cascade at 448x320 (fusion net 13.2 vs 11.2 ms,
    cascade 232.7 vs 253.8 pairs/s) and only reaches parity at Sintel
    width (23.07 vs 23.32 ms) — its tap matmuls pay the SAME 128-lane
    padding bill as XLA's convs, plus ~1.4-1.9x halo recompute at
    VMEM-fitting tile sizes, which together cancel the ~2.5 ms of layout
    copies + phase repacks it eliminates. Kept in-tree opt-in
    (FLOWNET2_TPU_FUSION_HEAD=1) with full test coverage; the numeric
    check and A/B scripts are the round-5 evidence."""
    import os

    return os.environ.get("FLOWNET2_TPU_FUSION_HEAD", "") == "1" and (
        jax.default_backend() in ("tpu", "axon")
    )


@jax.custom_vjp
def _fusion_head_routed(cat1, c0_2, p):
    # cat1 may arrive 162-channel or pre-padded to 256 (the kernel's
    # lane-aligned DMA shape — producers concat the zeros in directly).
    from flownet2_tpu.ops.pallas.fusion_head import (
        build_fusion_head_weights,
        fusion_head_pallas,
    )

    fw = build_fusion_head_weights(p, cat1.dtype)
    return fusion_head_pallas(cat1, c0_2, fw)


def _fusion_head_fwd(cat1, c0_2, p):
    return _fusion_head_routed(cat1, c0_2, p), (cat1, c0_2, p)


def _fusion_head_bwd(res, g):
    cat1, c0_2, p = res
    _, vjp = jax.vjp(
        lambda c, c0, p: _fusion_head_xla(c[..., :162], c0, p), cat1, c0_2, p
    )
    return vjp(g)


_fusion_head_routed.defvjp(_fusion_head_fwd, _fusion_head_bwd)


def fusion_head(cat1: jnp.ndarray, c0_2: jnp.ndarray, p: dict):
    """(concat1 (162 or 256ch), c0_2, fusion params) -> (flow0_2 s2d,
    flow1). Routes the fused Pallas decoder-head kernel on TPU (wide
    geometries), XLA composition elsewhere."""
    if fusion_head_ok(cat1.shape[2]):
        return _fusion_head_routed(cat1, c0_2, p)
    return _fusion_head_xla(cat1[..., :162], c0_2, p)
