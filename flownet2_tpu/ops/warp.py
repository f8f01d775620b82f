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
  (image-gradient dot), flow_warp_layer.cpp:119-195. Autodiff of the gather
  formulation produces exactly those formulas; on TPU the image gradient's
  scatter-add faults the runtime, so the gather method's backward routes
  through the exact f32 one-hot matmuls, and the fast paths use the
  hand-derived windowed VJP (_flow_warp_windowed_bwd).

TPU-native design: ONE gather per output pixel fetching the whole 2×2×C
bilinear footprint as a contiguous patch (48B for C=3), instead of four
scalar taps — XLA's TPU gather is DMA-rate limited, so fewer/larger slices
win (~20% over 4 separate taps at 448×320; measured on v5e). The corner
clamp is folded into the patch base: base = min(floor(p), size-2) with the
fractional weight clipped to [0,1], which reproduces the reference's
clamp-right/bottom convention exactly (TL==TR when x2 > W-1 etc.).
"""

from __future__ import annotations

import os
import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_method_override = threading.local()


@contextmanager
def force_warp_method(method: str):
    """Trace-time override: inside this context every ``flow_warp`` call
    that would resolve ``method="auto"`` resolves to ``method`` instead
    (explicit per-call methods are untouched). This is how evaluation
    paths become exact-by-construction: ``FlowRunner(warp_method="gather")``
    traces its whole cascade under this context, so every internal warp
    takes the reference-exact path (flow_warp_layer.cpp:58-117 is exact
    everywhere; the Pallas/windowed fast paths clamp a measured 1.5%/11.9%
    of pixels on Sintel-statistics flows — docs/DESIGN_NOTES.md
    "Windowed-warp clamp"). Thread-local; only matters during tracing."""
    prev = getattr(_method_override, "method", None)
    _method_override.method = method
    try:
        yield
    finally:
        _method_override.method = prev


def flow_warp(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    method: str = "auto",
) -> jnp.ndarray:
    """Warp ``image`` (N,H,W,C) by ``flow`` (N,H,W,2) → (N,H,W,C).

    out(x, y) = bilinear(image, x + u(x,y), y + v(x,y)); out-of-range targets
    take ``fill_value`` (0.0 or NaN to match the reference's two modes).

    ``method`` makes the speed/exactness trade explicit (VERDICT r1 §weak.6):
      "gather"   — exact fp32 patch-gather (the parity path);
      "onehot"   — full one-hot MXU formulation, bf16, ~1e-3 abs error;
      "windowed" — windowed one-hot MXU formulation (exact within a
                   per-tile flow-variation budget, clamps outliers to the
                   window edge — see flow_warp_windowed);
      "pallas"   — the same windowed algorithm as ONE fused Pallas program
                   (ops/pallas/warp.py; default fast path — kills the XLA
                   version's 80-step scan dispatch overhead). On TPU the
                   gradients default to the fused Pallas backward kernel
                   (measured 13.5 → 5.8 ms fwd+bwd at Sintel b4);
                   FLOWNET2_TPU_WARP_BWD=xla opts back into the
                   hand-derived windowed XLA VJP (same clamp contract);
      "halo"     — spatially-sharded warp with bounded halo exchange
                   (flow_warp_halo; needs an activation_sharding(mesh)
                   context). Moves 2*halo boundary rows over ICI instead
                   of the all-gather GSPMD inserts for "gather"; halo
                   derives from the Pallas vertical budget (same clamp
                   contract);
      "auto"     — "halo" when tracing under an activation_sharding mesh
                   with a spatial axis > 1 that divides H; else "pallas"
                   for bf16 images on a TPU, else "gather" (CPU) /
                   "windowed". Override globally with FLOWNET2_TPU_WARP.
    """
    if method == "auto":
        forced = getattr(_method_override, "method", None)
        if forced is not None:
            method = forced  # force_warp_method context (eval exactness)
    if method == "auto":
        method = os.environ.get("FLOWNET2_TPU_WARP", "auto")
    if method == "auto":
        # Spatially-sharded tracing context → the bounded halo exchange
        # (traffic: 2*halo boundary rows over ICI instead of the image-wide
        # all-gather GSPMD inserts for data-dependent gathers). Same
        # vertical-clamp contract as the Pallas/windowed kernels (the halo
        # derives from their budget), so routing is a traffic change only.
        from flownet2_tpu.parallel.annotate import current_mesh

        mesh = current_mesh()
        if (
            mesh is not None
            and mesh.shape.get("spatial", 1) > 1
            and image.shape[1] % mesh.shape["spatial"] == 0
        ):
            return flow_warp_halo(image, flow, fill_value, mesh=mesh)
        backend = jax.default_backend()
        if backend == "cpu":
            # exact oracle path (tests, parity runs)
            method = "gather"
        elif image.dtype == jnp.bfloat16 and backend in ("tpu", "axon"):
            method = "pallas"
        else:
            # TPU has no gather unit: the per-item dynamic-slice fallback is
            # slow AND its compile blows up at full resolution (f32 cascade
            # programs took tens of minutes / OOM'd buffer assignment).
            # The windowed path is exact within the documented |dx|<=127 /
            # |dy|<=55 per-tile budgets; pass method="gather" explicitly for
            # strict-parity runs.
            method = "windowed"
    if method == "pallas":
        return _flow_warp_pallas_vjp(image, flow, fill_value)
    if method == "windowed":
        return _flow_warp_windowed_hand(image, flow, fill_value)
    if method == "onehot":
        return flow_warp_onehot(image, flow, fill_value)
    if method == "halo":
        from flownet2_tpu.parallel.annotate import current_mesh

        mesh = current_mesh()
        if mesh is None:
            raise ValueError(
                "method='halo' needs an activation_sharding(mesh) context "
                "or call flow_warp_halo(..., mesh=...) directly"
            )
        return flow_warp_halo(image, flow, fill_value, mesh=mesh)
    if method == "gather":
        if jax.default_backend() in ("tpu", "axon"):
            # The gather formulation's image gradient is a scatter-add,
            # which FAULTS the TPU runtime on this stack (worker crash,
            # observed on v5e). Same forward, backward through the exact
            # f32 one-hot matmul formulation instead (identical math; the
            # one-hot weights ARE the bilinear taps).
            return _flow_warp_gather_safe(image, flow, fill_value)
        return flow_warp_gather(image, flow, fill_value)
    raise ValueError(f"unknown flow_warp method {method!r}")


def flow_warp_gather(
    image: jnp.ndarray, flow: jnp.ndarray, fill_value: float = 0.0
) -> jnp.ndarray:
    """Patch-gather implementation (exact fp32 arithmetic)."""
    n, h, w, c = image.shape
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")

    orig_dtype = image.dtype
    img = image.astype(jnp.float32)

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)  # (N,H,W)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)

    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    out = _bilinear_sample(img, x2, y2, valid, fill_value)
    return out.astype(orig_dtype)


def _bilinear_sample(img, x2, y2, valid, fill_value):
    """Bilinear patch-gather core: sample ``img`` (N,Hs,W,C) f32 at float
    coordinates ``x2``/``y2`` (N,H,W, in img's own row/col space), masked by
    ``valid``. Shared by the whole-image gather warp and the halo-exchange
    sharded warp (which samples an extended local tile at offset rows)."""
    n, hs, w, c = img.shape
    h = x2.shape[1]
    # Patch base: min(floor, size-2) keeps the 2×2 footprint in-bounds; the
    # clipped fractional weight makes the clamped column/row exact
    # (flow_warp_layer.cpp:88-94's min(ix_L+1, width-1) convention).
    x2s = jnp.clip(x2, 0.0, w - 1)
    y2s = jnp.clip(y2, 0.0, hs - 1)
    xb = jnp.minimum(jnp.floor(x2s).astype(jnp.int32), w - 2)
    yb = jnp.minimum(jnp.floor(y2s).astype(jnp.int32), hs - 2)
    alpha = jnp.clip(x2s - xb.astype(jnp.float32), 0.0, 1.0)[..., None]
    beta = jnp.clip(y2s - yb.astype(jnp.float32), 0.0, 1.0)[..., None]

    starts = jnp.stack([yb, xb], axis=-1).reshape(n, h * w, 2)

    def per_item(im, ix):
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return lax.gather(
            im, ix, dn, slice_sizes=(2, 2, c), mode=lax.GatherScatterMode.CLIP
        )

    patches = jax.vmap(per_item)(img, starts).reshape(n, h, w, 2, 2, c)
    top = patches[:, :, :, 0, 0] * (1 - alpha) + patches[:, :, :, 0, 1] * alpha
    bot = patches[:, :, :, 1, 0] * (1 - alpha) + patches[:, :, :, 1, 1] * alpha
    out = top * (1 - beta) + bot * beta
    return jnp.where(valid[..., None], out, jnp.float32(fill_value))


def flow_warp_halo(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    mesh,
    halo: int | None = None,
    axis: str = "spatial",
) -> jnp.ndarray:
    """Spatially-sharded FlowWarp with bounded halo exchange.

    GSPMD's default partitioning of the gather warp ALL-GATHERS the source
    image onto every device of the spatial axis (the gather's row indices
    are data-dependent, so the partitioner must assume any row can be
    needed). But vertical flow is bounded in practice — the windowed/Pallas
    warp already documents a per-tile |dy| budget — so each device only
    needs ``halo`` rows from each spatial neighbor. This op makes that
    explicit the TPU way: a ``shard_map`` whose body ``ppermute``s the
    boundary rows to adjacent spatial shards over ICI and bilinearly
    samples its extended local tile. Cross-device traffic per shard drops
    from the whole image (all-gather) to ``2*halo`` rows.

    Contract: exact (== the gather warp) for targets with |dy| <= halo;
    larger vertical displacements clamp to the nearest exchanged row (the
    same window-edge clamp contract as ops/pallas/warp.py). Horizontal
    range is unrestricted (W is never sharded on this mesh).

    Reference semantics reproduced: flow_warp_layer.cpp:74-195 (bilinear
    sample, fill outside, clamp-right/bottom edge convention).
    """
    from jax.sharding import PartitionSpec as P

    if halo is None:
        # derive from the Pallas kernel's per-tile vertical budget so the
        # sharded and single-chip fast paths share one clamp contract
        # (|dy| <= 55 ⇒ footprint reaches floor(y+55)+1 = 56 rows out)
        from flownet2_tpu.ops.pallas.warp import VERTICAL_BUDGET

        halo = VERTICAL_BUDGET + 1
    s = mesh.shape.get(axis, 1)
    if s <= 1:
        return flow_warp_gather(image, flow, fill_value)
    n, h, w, c = image.shape
    if h % s != 0:
        raise ValueError(f"H={h} must divide the {axis} axis ({s})")
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")
    halo = min(halo, h // s)  # a shard never needs more than a full neighbor

    def body(img_t, flow_t):
        nl, hl, _, _ = img_t.shape
        idx = lax.axis_index(axis)
        offset = (idx * hl).astype(jnp.float32)
        img32 = img_t.astype(jnp.float32)
        # boundary-row exchange: rows ABOVE my tile come from the previous
        # shard's bottom rows, rows BELOW from the next shard's top rows;
        # edge shards receive zeros (never read by globally-valid targets)
        up = lax.ppermute(
            img32[:, -halo:], axis, [(i, i + 1) for i in range(s - 1)]
        )
        down = lax.ppermute(
            img32[:, :halo], axis, [(i + 1, i) for i in range(s - 1)]
        )
        ext = jnp.concatenate([up, img32, down], axis=1)

        xs = lax.broadcasted_iota(jnp.float32, (hl, w), 1)
        ys = lax.broadcasted_iota(jnp.float32, (hl, w), 0) + offset
        x2 = xs[None] + flow_t[..., 0].astype(jnp.float32)
        y2g = ys[None] + flow_t[..., 1].astype(jnp.float32)  # global rows
        valid = (x2 >= 0) & (y2g >= 0) & (x2 < w) & (y2g < h)
        # clamp to the GLOBAL image rows BEFORE converting to extended-tile
        # coordinates: the base warp's clamp-bottom convention must resolve
        # against the real last row, not the edge shard's zero-filled halo
        ye = jnp.clip(y2g, 0.0, h - 1) - offset + halo
        out = _bilinear_sample(ext, x2, ye, valid, fill_value)
        return out.astype(img_t.dtype)

    data = mesh.shape.get("data", 1)
    spec = P("data" if data > 1 and n % data == 0 else None, axis)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec), out_specs=spec
    )(image, flow)


def flow_warp_onehot(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """One-hot MXU formulation: per output row, the horizontal bilinear
    lerp is a (W_out × W_src) two-entry matrix applied to all source rows
    on the MXU, followed by a per-lane vertical lerp contraction. Replaces
    per-pixel gathers (no TPU gather unit) with dense matmuls — ~3× faster
    than the gather path at 448×320×bf16 on v5e, ~1e-3 absolute error from
    bf16 accumulation of the one-hot matmul.

    The scan over output rows keeps the (B, W, W) one-hot transient small
    and compiles to a single fused loop body.
    """
    n, h, w, c = image.shape
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")
    orig_dtype = image.dtype
    img = image.astype(compute_dtype)

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    x2c = jnp.clip(x2, 0.0, w - 1)
    y2c = jnp.clip(y2, 0.0, h - 1)
    xb = jnp.minimum(jnp.floor(x2c).astype(jnp.int32), w - 2)
    yb = jnp.minimum(jnp.floor(y2c).astype(jnp.int32), h - 2)
    ax = jnp.clip(x2c - xb.astype(jnp.float32), 0.0, 1.0)
    ay = jnp.clip(y2c - yb.astype(jnp.float32), 0.0, 1.0)

    wcols = lax.broadcasted_iota(jnp.int32, (1, w), 1)  # (1, W)
    hrows = lax.broadcasted_iota(jnp.int32, (1, h), 1)  # (1, H)

    def row_step(_, inputs):
        xb_r, ax_r, yb_r, ay_r = inputs  # (B, W) each
        # oh[b, l, s]: weight of source column s for output column l
        oh = (wcols[None] == xb_r[:, :, None]) * (1 - ax_r[:, :, None]) + (
            wcols[None] == (xb_r + 1)[:, :, None]
        ) * ax_r[:, :, None]
        hsel = jnp.einsum(
            "bls,bhsc->bhlc", oh.astype(compute_dtype), img,
            preferred_element_type=jnp.float32,
        )
        # vsel[b, l, h]: vertical two-entry lerp weights per output column
        vsel = (hrows[None] == yb_r[:, :, None]) * (1 - ay_r[:, :, None]) + (
            hrows[None] == (yb_r + 1)[:, :, None]
        ) * ay_r[:, :, None]
        out_row = jnp.einsum("blh,bhlc->blc", vsel, hsel)
        return None, out_row

    per_row = (
        jnp.transpose(xb, (1, 0, 2)),
        jnp.transpose(ax, (1, 0, 2)),
        jnp.transpose(yb, (1, 0, 2)),
        jnp.transpose(ay, (1, 0, 2)),
    )
    _, rows = lax.scan(row_step, None, per_row)  # (H, B, W, C)
    out = jnp.transpose(rows, (1, 0, 2, 3))
    out = jnp.where(valid[..., None], out, jnp.float32(fill_value))
    return out.astype(orig_dtype)


def flow_warp_windowed(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    fill_value: float = 0.0,
    *,
    rows_per_tile: int = 8,
    col_chunk: int = 256,
    src_window: int = 384,
    v_window: int = 64,
) -> jnp.ndarray:
    """Windowed one-hot MXU warp (the round-2 fast path).

    The full one-hot formulation costs B·H·W·(W·H)·C MACs — quadratic in BOTH
    image dims (ROADMAP r1 item 1). Flow fields are locally coherent, so for
    each (rows_per_tile × col_chunk) output tile the bilinear footprints live
    in a small dynamically-positioned source window: slice a (v_window ×
    src_window) window at the tile's minimum source coordinate and contract
    one-hot lerp matrices against it — B·H·W·(v_window·src_window)·C MACs,
    independent of image size. M = rows_per_tile·col_chunk = 1024 rows per
    matmul keeps the MXU full (the per-row variant's M=W underutilizes it).

    Exact (up to bf16 rounding) whenever the flow variation inside one tile
    fits the window: |Δx| ≤ src_window - col_chunk - 1 (127 by default) and
    |Δy| ≤ v_window - rows_per_tile - 1 (55). Outlier pixels clamp to the
    window edge (documented divergence; use method="gather" for parity runs).
    Measured on v5e (bf16): 4.1 ms vs onehot's 7.9 at 448×320·b8, 5.9 vs
    29.7 at 1024×448·b4 (the windows make cost linear in image size); the
    sweep showed times are overhead-bound, not FLOP-bound, so v_window stays
    at a safe 64.
    Gradients flow to image and flow exactly as in the other formulations
    (the one-hot weights are linear in the lerp fractions).
    """
    n, h, w, c = image.shape
    if flow.shape[:3] != (n, h, w) or flow.shape[3] != 2:
        raise ValueError(f"flow shape {flow.shape} incompatible with image {image.shape}")
    orig_dtype = image.dtype
    cdtype = jnp.bfloat16 if orig_dtype == jnp.bfloat16 else jnp.float32
    rt, ck, sw, vw = rows_per_tile, col_chunk, src_window, v_window

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    x2c = jnp.clip(x2, 0.0, w - 1)
    y2c = jnp.clip(y2, 0.0, h - 1)
    xb = jnp.minimum(jnp.floor(x2c).astype(jnp.int32), w - 2)
    yb = jnp.minimum(jnp.floor(y2c).astype(jnp.int32), h - 2)
    ax = jnp.clip(x2c - xb.astype(jnp.float32), 0.0, 1.0).astype(cdtype)
    ay = jnp.clip(y2c - yb.astype(jnp.float32), 0.0, 1.0).astype(cdtype)

    # Pad the output grid to whole tiles and the image to window minima.
    # Coordinate pads must be LARGE, not zero: the per-tile window base is a
    # min over the tile, and a zero pad in a partial last chunk drags the
    # base to 0, clamping every real pixel whose source lies beyond the
    # window (caught as a mean-46px vertical error at 448x320). Large pads
    # clip to the window edge in pixels that only exist to be cropped.
    hp = -(-h // rt) * rt
    wp = -(-w // ck) * ck
    pad2 = ((0, 0), (0, hp - h), (0, wp - w))
    big = max(h, w) * 2
    xb = jnp.pad(xb, pad2, constant_values=big)
    yb = jnp.pad(yb, pad2, constant_values=big)
    ax, ay = jnp.pad(ax, pad2), jnp.pad(ay, pad2)
    him, wim = max(h, vw), max(w, sw)
    img = jnp.pad(
        image.astype(cdtype), ((0, 0), (0, him - h), (0, wim - w), (0, 0))
    )

    nt, nc = hp // rt, wp // ck
    # per-(item, tile, chunk) window bases = min source coordinate, clamped
    xb_t = xb.reshape(n, nt, rt, nc, ck)
    yb_t = yb.reshape(n, nt, rt, nc, ck)
    x0 = jnp.clip(jnp.min(xb_t, axis=(2, 4)), 0, wim - sw)  # (n, nt, nc)
    y0 = jnp.clip(jnp.min(yb_t, axis=(2, 4)), 0, him - vw)  # (n, nt, nc)

    scols = lax.broadcasted_iota(jnp.int32, (1, 1, sw), 2)
    vrows = lax.broadcasted_iota(jnp.int32, (1, 1, vw), 2)
    m = rt * ck

    def tile_step(_, inp):
        xb_r, ax_r, yb_r, ay_r, x0_r, y0_r = inp  # (n,rt,nc,ck)… and (n,nc)
        outs = []
        for k in range(nc):
            win = jax.vmap(
                lambda im, ry, rx: lax.dynamic_slice(im, (ry, rx, 0), (vw, sw, c))
            )(img, y0_r[:, k], x0_r[:, k])  # (n, vw, sw, c)
            xrel = jnp.clip(
                xb_r[:, :, k] - x0_r[:, k, None, None], 0, sw - 2
            ).reshape(n, m)
            yrel = jnp.clip(
                yb_r[:, :, k] - y0_r[:, k, None, None], 0, vw - 2
            ).reshape(n, m)
            axk = ax_r[:, :, k].reshape(n, m)[..., None]
            ayk = ay_r[:, :, k].reshape(n, m)[..., None]
            oh = (scols == xrel[..., None]) * (1 - axk) + (
                scols == xrel[..., None] + 1
            ) * axk  # (n, m, sw)
            hsel = jnp.einsum(
                "bms,bvsc->bmvc", oh.astype(cdtype), win,
                preferred_element_type=jnp.float32,
            )
            vsel = (vrows == yrel[..., None]) * (1 - ayk) + (
                vrows == yrel[..., None] + 1
            ) * ayk  # (n, m, vw)
            out_k = jnp.einsum("bmv,bmvc->bmc", vsel.astype(jnp.float32), hsel)
            outs.append(out_k.reshape(n, rt, ck, c))
        return None, jnp.concatenate(outs, axis=2)  # (n, rt, wp, c)

    per_tile = (
        jnp.moveaxis(xb_t, 1, 0),
        jnp.moveaxis(ax.reshape(n, nt, rt, nc, ck), 1, 0),
        jnp.moveaxis(yb_t, 1, 0),
        jnp.moveaxis(ay.reshape(n, nt, rt, nc, ck), 1, 0),
        jnp.moveaxis(x0, 1, 0),
        jnp.moveaxis(y0, 1, 0),
    )
    _, tiles = lax.scan(tile_step, None, per_tile)  # (nt, n, rt, wp, c)
    out = jnp.transpose(tiles, (1, 0, 2, 3, 4)).reshape(n, hp, wp, c)
    out = out[:, :h, :w]
    out = jnp.where(valid[..., None], out, jnp.float32(fill_value))
    return out.astype(orig_dtype)


def warp_clamp_fraction(flow, *, geometry: str = "pallas") -> np.ndarray:
    """Fraction of pixels a fast-path warp would clamp, per batch item.

    The windowed/Pallas warps are exact only while each output tile's
    bilinear footprints fit the tile's source window (budgets ~127 px
    horizontal / ~55 px vertical of INTRA-TILE flow variation — constant
    offsets cost nothing because the window base follows the tile minimum).
    This mirrors the exact base selection of both geometries
    (``"pallas"``: 16×128 tiles, bases aligned down to (8, 128), SW=384/
    VW=80; ``"windowed"``: 8×256 tiles, unaligned bases, SW=384/VW=64) and
    counts footprints that fall outside — the pixels whose samples clamp to
    the window edge instead of the true source (documented divergence; the
    measured image-space error tables live in docs/DESIGN_NOTES.md).

    Use it on predicted/GT flows to decide whether a content class needs
    ``method="gather"`` (exact everywhere) instead of the fast paths.
    Host-side numpy diagnostic; not differentiable, not jittable.
    """
    if geometry == "pallas":
        rt, ck, sw, vw, xal, yal = 16, 128, 384, 80, 128, 8
    elif geometry == "windowed":
        rt, ck, sw, vw, xal, yal = 8, 256, 384, 64, 1, 1
    else:
        raise ValueError(f"geometry must be 'pallas' or 'windowed', got {geometry!r}")
    flow = np.asarray(flow, np.float32)
    n, h, w, _ = flow.shape
    xs, ys = np.meshgrid(
        np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32)
    )
    x2 = np.clip(xs[None] + flow[..., 0], 0, w - 1)
    y2 = np.clip(ys[None] + flow[..., 1], 0, h - 1)
    xb = np.minimum(np.floor(x2).astype(np.int32), w - 2)
    yb = np.minimum(np.floor(y2).astype(np.int32), h - 2)
    hp, wp = -(-h // rt) * rt, -(-w // ck) * ck
    big = max(h, w) * 2  # pad partial tiles the way the kernels do
    pad = ((0, 0), (0, hp - h), (0, wp - w))
    xbp = np.pad(xb, pad, constant_values=big).reshape(n, hp // rt, rt, wp // ck, ck)
    ybp = np.pad(yb, pad, constant_values=big).reshape(n, hp // rt, rt, wp // ck, ck)
    him = max(-(-max(h, vw) // yal) * yal, vw)
    wim = max(-(-w // xal) * xal, sw)
    x0 = np.clip(xbp.min(axis=(2, 4)) // xal * xal, 0, wim - sw)
    y0 = np.clip(ybp.min(axis=(2, 4)) // yal * yal, 0, him - vw)
    # footprint tap xb+1 must land within [x0, x0+sw-1] (same vertically)
    viol = (xbp - x0[:, :, None, :, None] > sw - 2) | (
        ybp - y0[:, :, None, :, None] > vw - 2
    )
    real = np.zeros((n, hp, wp), bool)
    real[:, :h, :w] = True
    viol = viol.reshape(n, hp, wp) & real
    return viol.reshape(n, -1).sum(axis=1) / float(h * w)


# -- Pallas fast path -------------------------------------------------------
# Forward: the fused kernel (ops/pallas/warp.py). Backward: on TPU the
# DEFAULT is the fused Pallas backward kernel (flow_warp_pallas_bwd — the
# exact VJP of the forward's window geometry, 2.3× the XLA windowed
# gradients on v5e); FLOWNET2_TPU_WARP_BWD=xla (and any non-TPU backend)
# falls back to the hand-derived windowed XLA VJP, the same windowed
# approximation family.


@jax.custom_vjp
def _flow_warp_pallas_core(image, flow, fill_value):
    from flownet2_tpu.ops.pallas.warp import flow_warp_pallas

    return flow_warp_pallas(image, flow, fill_value)


def _fwp_fwd(image, flow, fill_value):
    return _flow_warp_pallas_core(image, flow, fill_value), (image, flow, fill_value)


def _fwp_bwd(res, g):
    image, flow, fill_value = res
    if (
        jax.default_backend() in ("tpu", "axon")
        and os.environ.get("FLOWNET2_TPU_WARP_BWD", "pallas") == "pallas"
    ):
        # Fused backward kernel — the exact VJP of the Pallas forward (same
        # window bases/geometry). Default on TPU since measured 2.3× faster
        # than the XLA windowed gradients on v5e (fwd+bwd 9.6 → 4.2 ms at
        # 448×320 b8, 13.5 → 5.8 ms at Sintel b4); FLOWNET2_TPU_WARP_BWD=xla
        # restores the hand windowed XLA gradients (rt=8/ck=256 geometry).
        from flownet2_tpu.ops.pallas.warp import flow_warp_pallas_bwd

        dimg, dflow = flow_warp_pallas_bwd(image, flow, g, fill_value)
        return dimg, dflow, None
    dimg, dflow = _flow_warp_windowed_bwd(image, flow, fill_value, g)
    return dimg, dflow, None


_flow_warp_pallas_core.defvjp(_fwp_fwd, _fwp_bwd)


def _flow_warp_pallas_vjp(image, flow, fill_value=0.0):
    return _flow_warp_pallas_core(image, flow, fill_value)


# -- TPU-safe gather path ---------------------------------------------------


@jax.custom_vjp
def _flow_warp_gather_safe(image, flow, fill_value):
    return flow_warp_gather(image, flow, fill_value)


def _fwg_fwd(image, flow, fill_value):
    return flow_warp_gather(image, flow, fill_value), (image, flow, fill_value)


def _fwg_bwd(res, g):
    image, flow, fill_value = res
    # Exact f32 bilinear gradients without any scatter primitive: the
    # one-hot matmul formulation's taps are the same two-entry bilinear
    # weights, so its VJP produces the reference formulas
    # (flow_warp_layer.cpp:119-195) as dense transposed matmuls.
    _, vjp = jax.vjp(
        lambda im, fl: flow_warp_onehot(
            im.astype(jnp.float32), fl.astype(jnp.float32), fill_value,
            compute_dtype=jnp.float32,
        ),
        image,
        flow,
    )
    dimg, dflow = vjp(g.astype(jnp.float32))
    return dimg.astype(image.dtype), dflow.astype(flow.dtype), None


_flow_warp_gather_safe.defvjp(_fwg_fwd, _fwg_bwd)


# -- Hand-derived windowed backward ----------------------------------------
# Autodiff through the windowed scan materializes per-step one-hot
# residuals (~GBs at 448x320 b8) and transposes the scan into latency-bound
# step chains: measured 31 ms fwd+bwd per warp. This backward recomputes the
# tile geometry (the correlation hand-VJP strategy) and expresses the three
# gradient contractions per chunk as dense MXU matmuls:
#   t    = vsel ⊗ g                      (outer, VPU)
#   dwin = ohᵀ @ t                       (image gradient, into the window)
#   q    = t @ win                       (→ du via the one-hot derivative)
#   hsel = oh @ win                      (→ dv likewise)
# du/dv chain through the same clip saturations autodiff sees (x2 outside
# [0, size-1] → zero; window-edge-clamped xrel keeps its ax-derivative,
# matching the one-hot's autodiff exactly).


def _flow_warp_windowed_bwd(image, flow, fill_value, g):
    n, h, w, c = image.shape
    rt, ck, sw, vw = 8, 256, 384, 64  # keep in sync with flow_warp_windowed
    orig_img_dtype = image.dtype
    cdtype = jnp.bfloat16 if image.dtype == jnp.bfloat16 else jnp.float32

    xs = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x2 = xs[None] + flow[..., 0].astype(jnp.float32)
    y2 = ys[None] + flow[..., 1].astype(jnp.float32)
    valid = (x2 >= 0) & (y2 >= 0) & (x2 < w) & (y2 < h)
    x2c = jnp.clip(x2, 0.0, w - 1)
    y2c = jnp.clip(y2, 0.0, h - 1)
    xb = jnp.minimum(jnp.floor(x2c).astype(jnp.int32), w - 2)
    yb = jnp.minimum(jnp.floor(y2c).astype(jnp.int32), h - 2)
    ax = jnp.clip(x2c - xb.astype(jnp.float32), 0.0, 1.0).astype(cdtype)
    ay = jnp.clip(y2c - yb.astype(jnp.float32), 0.0, 1.0).astype(cdtype)
    # clip chain: grads vanish once x2/y2 leaves [0, size-1]
    dumask = ((x2 >= 0) & (x2 <= w - 1)).astype(jnp.float32)
    dvmask = ((y2 >= 0) & (y2 <= h - 1)).astype(jnp.float32)

    g_eff = jnp.where(valid[..., None], g.astype(cdtype), 0)

    hp = -(-h // rt) * rt
    wp = -(-w // ck) * ck
    pad2 = ((0, 0), (0, hp - h), (0, wp - w))
    big = max(h, w) * 2
    xb = jnp.pad(xb, pad2, constant_values=big)
    yb = jnp.pad(yb, pad2, constant_values=big)
    ax, ay = jnp.pad(ax, pad2), jnp.pad(ay, pad2)
    g_eff = jnp.pad(g_eff, pad2 + ((0, 0),))
    him, wim = max(h, vw), max(w, sw)
    img = jnp.pad(
        image.astype(cdtype), ((0, 0), (0, him - h), (0, wim - w), (0, 0))
    )

    nt, nc = hp // rt, wp // ck
    xb_t = xb.reshape(n, nt, rt, nc, ck)
    yb_t = yb.reshape(n, nt, rt, nc, ck)
    x0 = jnp.clip(jnp.min(xb_t, axis=(2, 4)), 0, wim - sw)
    y0 = jnp.clip(jnp.min(yb_t, axis=(2, 4)), 0, him - vw)

    scols = lax.broadcasted_iota(jnp.int32, (1, 1, sw), 2)
    vrows = lax.broadcasted_iota(jnp.int32, (1, 1, vw), 2)
    m = rt * ck

    def tile_step(dimg, inp):
        xb_r, ax_r, yb_r, ay_r, g_r, x0_r, y0_r = inp
        dus, dvs = [], []
        for k in range(nc):
            win = jax.vmap(
                lambda im, ry, rx: lax.dynamic_slice(im, (ry, rx, 0), (vw, sw, c))
            )(img, y0_r[:, k], x0_r[:, k])  # (n, vw, sw, c)
            xrel = jnp.clip(
                xb_r[:, :, k] - x0_r[:, k, None, None], 0, sw - 2
            ).reshape(n, m)
            yrel = jnp.clip(
                yb_r[:, :, k] - y0_r[:, k, None, None], 0, vw - 2
            ).reshape(n, m)
            axk = ax_r[:, :, k].reshape(n, m)[..., None]
            ayk = ay_r[:, :, k].reshape(n, m)[..., None]
            gk = g_r[:, :, k].reshape(n, m, c)
            oh = (
                (scols == xrel[..., None]) * (1 - axk)
                + (scols == xrel[..., None] + 1) * axk
            ).astype(cdtype)
            vsel = (
                (vrows == yrel[..., None]) * (1 - ayk)
                + (vrows == yrel[..., None] + 1) * ayk
            ).astype(cdtype)

            t = (vsel[..., None] * gk[:, :, None, :])  # (n, m, vw, c)
            dwin = jnp.einsum(
                "bms,bmvc->bvsc", oh, t, preferred_element_type=jnp.float32
            )
            q = jnp.einsum(
                "bmvc,bvsc->bms", t, win, preferred_element_type=jnp.float32
            )
            doh = (scols == xrel[..., None] + 1).astype(jnp.float32) - (
                scols == xrel[..., None]
            ).astype(jnp.float32)
            du_k = jnp.sum(q * doh, axis=-1)  # (n, m)
            hsel = jnp.einsum(
                "bms,bvsc->bmvc", oh, win, preferred_element_type=jnp.float32
            )
            e = jnp.sum(hsel * gk[:, :, None, :].astype(jnp.float32), axis=-1)
            dvsel = (vrows == yrel[..., None] + 1).astype(jnp.float32) - (
                vrows == yrel[..., None]
            ).astype(jnp.float32)
            dv_k = jnp.sum(e * dvsel, axis=-1)  # (n, m)
            dus.append(du_k.reshape(n, rt, ck))
            dvs.append(dv_k.reshape(n, rt, ck))

            # accumulate the window gradient (per-item dynamic updates —
            # NO scatter primitive: it faults the TPU runtime, see
            # _flow_warp_gather_safe). A scan over the batch axis keeps the
            # jaxpr batch-size-independent (VERDICT r2 weak.9: the previous
            # Python loop unrolled n slice/update pairs per chunk).
            def acc_one(d, inp):
                dw, yy, xx, bi = inp
                cur = lax.dynamic_slice(d, (bi, yy, xx, 0), (1, vw, sw, c))
                return (
                    lax.dynamic_update_slice(d, cur + dw[None], (bi, yy, xx, 0)),
                    None,
                )

            dimg, _ = lax.scan(
                acc_one,
                dimg,
                (dwin, y0_r[:, k], x0_r[:, k], jnp.arange(n, dtype=jnp.int32)),
            )
        return dimg, (jnp.concatenate(dus, axis=2), jnp.concatenate(dvs, axis=2))

    per_tile = (
        jnp.moveaxis(xb_t, 1, 0),
        jnp.moveaxis(ax.reshape(n, nt, rt, nc, ck), 1, 0),
        jnp.moveaxis(yb_t, 1, 0),
        jnp.moveaxis(ay.reshape(n, nt, rt, nc, ck), 1, 0),
        jnp.moveaxis(g_eff.reshape(n, nt, rt, nc, ck, c), 1, 0),
        jnp.moveaxis(x0, 1, 0),
        jnp.moveaxis(y0, 1, 0),
    )
    dimg0 = jnp.zeros((n, him, wim, c), jnp.float32)
    dimg, (du_t, dv_t) = lax.scan(tile_step, dimg0, per_tile)
    du = jnp.transpose(du_t, (1, 0, 2, 3)).reshape(n, hp, wp)[:, :h, :w]
    dv = jnp.transpose(dv_t, (1, 0, 2, 3)).reshape(n, hp, wp)[:, :h, :w]
    dflow = jnp.stack([du * dumask, dv * dvmask], axis=-1)
    return (
        dimg[:, :h, :w].astype(orig_img_dtype),
        dflow.astype(flow.dtype),
    )


@jax.custom_vjp
def _flow_warp_windowed_hand(image, flow, fill_value):
    return flow_warp_windowed(image, flow, fill_value)


def _fww_fwd(image, flow, fill_value):
    return flow_warp_windowed(image, flow, fill_value), (image, flow, fill_value)


def _fww_bwd(res, g):
    image, flow, fill_value = res
    dimg, dflow = _flow_warp_windowed_bwd(image, flow, fill_value, g)
    return dimg, dflow, None


_flow_warp_windowed_hand.defvjp(_fww_fwd, _fww_bwd)
