"""The augmentation engine: coefficient sampling + device-side transforms.

Reference: src/caffe/layers/{augmentation_layer_base,data_augmentation_layer,
flow_augmentation_layer,generate_augmentation_parameters_layer,
black_augmentation_layer}.* (SURVEY.md §2.2). Architecture here:

- **Host side** (numpy): per-item coefficient sampling with the reference's
  distributions (RandomGeneratorParameter semantics, util/rng.cpp:8-114:
  uniform/gaussian/bernoulli[+_bernoulli combos], optional exp, discretize,
  multiplier, spread scaled by the discount schedule), and the
  rejection loop keeping the transformed crop inside the source image
  (augmentation_layer_base.cpp:101-169, ≤50 tries). Data-dependent trial
  loops don't belong in a TPU program.
- **Device side** (jit): batched inverse-affine bilinear warps (the
  SpatialAugmentation kernel, data_augmentation_layer.cu:25-70), chromatic
  ops (ColorContrastAugmentation, :73-117), gaussian noise, and the paired
  flow transform (flow_augmentation_layer.cu:24-89). All fuse into the
  training step.

Affine convention (augmentation_layer_base.cpp:14-48): 2×3 matrices compose
center → mirror → rotate → translate → zoom⁻¹ → uncenter; the matrix maps
OUTPUT (crop) pixel coords to SOURCE pixel coords, so application is a
single inverse-warp gather.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Random generator spec (RandomGeneratorParameter, caffe.proto:607-616)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RandomSpec:
    rand_type: str = "uniform"  # uniform|gaussian|bernoulli|uniform_bernoulli|gaussian_bernoulli
    exp: bool = False
    mean: float = 0.0
    spread: float = 0.0
    prob: float = 1.0
    apply_schedule: bool = True
    discretize: bool = False
    multiplier: float = 1.0

    def sample(self, rng: np.random.Generator, discount: float = 1.0, prob0_value: float = np.nan) -> float:
        """Mirror of caffe_rng_generate (util/rng.cpp:8-114)."""
        spread = self.spread * discount if self.apply_schedule else self.spread
        t = self.rand_type
        if t == "uniform":
            v = rng.uniform(self.mean - spread, self.mean + spread) if spread > 0 else self.mean
            if self.exp:
                v = math.exp(v)
        elif t == "gaussian":
            v = rng.normal(self.mean, spread) if spread > 0 else self.mean
            if self.exp:
                v = math.exp(v)
        elif t == "bernoulli":
            v = float(rng.uniform() < self.prob) if self.prob > 0 else 0.0
        elif t in ("uniform_bernoulli", "gaussian_bernoulli"):
            on = (rng.uniform() < self.prob) if self.prob > 0 else False
            if not on:
                if not math.isnan(prob0_value):
                    return prob0_value
                v = 0.0
            else:
                if spread > 0:
                    v = (
                        rng.uniform(self.mean - spread, self.mean + spread)
                        if t == "uniform_bernoulli"
                        else rng.normal(self.mean, spread)
                    )
                else:
                    v = self.mean
            if self.exp:
                v = math.exp(v)
        else:
            raise ValueError(f"unknown rand_type {t!r}")
        if self.discretize:
            v = float(round(v))
        return self.multiplier * v


@dataclass(frozen=True)
class CoeffSchedule:
    """Discount ramp (CoeffScheduleParameter caffe.proto:693-697; formula
    data_augmentation_layer.cu:370-372)."""

    half_life: float = 1.0
    initial_coeff: float = 1.0
    final_coeff: float = 1.0

    def at(self, iteration: float) -> float:
        s = 2.0 / (1.0 + math.exp(-1.0986 * iteration / self.half_life)) - 1.0
        return self.initial_coeff + (self.final_coeff - self.initial_coeff) * s


# ---------------------------------------------------------------------------
# Spatial coefficients + affine composition
# ---------------------------------------------------------------------------


@dataclass
class SpatialCoeffs:
    mirror: float = 0.0
    dx: float = 0.0
    dy: float = 0.0
    angle: float = 0.0
    zoom_x: float = 1.0
    zoom_y: float = 1.0


@dataclass(frozen=True)
class SpatialAugSpec:
    mirror: Optional[RandomSpec] = None
    translate: Optional[RandomSpec] = None
    translate_x: Optional[RandomSpec] = None
    translate_y: Optional[RandomSpec] = None
    rotate: Optional[RandomSpec] = None
    zoom: Optional[RandomSpec] = None
    squeeze: Optional[RandomSpec] = None

    def any(self) -> bool:
        return any(
            getattr(self, f) is not None
            for f in ("mirror", "translate", "translate_x", "translate_y", "rotate", "zoom", "squeeze")
        )

    def sample(self, rng: np.random.Generator, discount: float = 1.0) -> SpatialCoeffs:
        """generate_spatial_coeffs (augmentation_layer_base.cpp:75-99)."""
        c = SpatialCoeffs()
        if self.mirror is not None:
            c.mirror = self.mirror.sample(rng, discount)
        if self.translate is not None:
            c.dx = self.translate.sample(rng, discount)
            c.dy = self.translate.sample(rng, discount)
        if self.translate_x is not None:
            c.dx = self.translate_x.sample(rng, discount)
        if self.translate_y is not None:
            c.dy = self.translate_y.sample(rng, discount)
        if self.rotate is not None:
            c.angle = self.rotate.sample(rng, discount)
        if self.zoom is not None:
            c.zoom_x = self.zoom.sample(rng, discount)
            c.zoom_y = c.zoom_x
        if self.squeeze is not None:
            s = self.squeeze.sample(rng, discount)
            c.zoom_x *= s
            c.zoom_y /= s
        return c


def _left_multiply(m, u):
    """Compose 2×3 affines the reference way (augmentation_layer_base.cpp:22-36).

    m, u: tuples (t0..t5) with x' = t0*x + t2*y + t4, y' = t1*x + t3*y + t5.
    """
    t0, t1, t2, t3, t4, t5 = m
    u0, u1, u2, u3, u4, u5 = u
    return (
        t0 * u0 + t1 * u2,
        t0 * u1 + t1 * u3,
        t2 * u0 + t3 * u2,
        t2 * u1 + t3 * u3,
        t4 * u0 + t5 * u2 + u4,
        t4 * u1 + t5 * u3 + u5,
    )


def spatial_matrix(
    c: SpatialCoeffs, crop_w: int, crop_h: int, src_w: int, src_h: int
) -> np.ndarray:
    """Crop-pixel → source-pixel affine (tTransMat::fromCoeff,
    augmentation_layer_base.cpp:38-48). Returns (6,) float32 [t0..t5]."""
    m = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    if c.mirror:
        m = _left_multiply(m, (-1, 0, 0, 1, 0.5 * crop_w, -0.5 * crop_h))
    else:
        m = _left_multiply(m, (1, 0, 0, 1, -0.5 * crop_w, -0.5 * crop_h))
    if c.angle:
        m = _left_multiply(
            m,
            (
                math.cos(c.angle),
                math.sin(c.angle),
                -math.sin(c.angle),
                math.cos(c.angle),
                0,
                0,
            ),
        )
    if c.dx or c.dy:
        m = _left_multiply(m, (1, 0, 0, 1, c.dx * crop_w, c.dy * crop_h))
    if c.zoom_x != 1.0 or c.zoom_y != 1.0:
        m = _left_multiply(m, (1.0 / c.zoom_x, 0, 0, 1.0 / c.zoom_y, 0, 0))
    m = _left_multiply(m, (1, 0, 0, 1, 0.5 * src_w, 0.5 * src_h))
    return np.asarray(m, np.float32)


def invert_affine(m: np.ndarray) -> np.ndarray:
    """tTransMat::inverse (augmentation_layer_base.cpp:52-69)."""
    a, b, c, d, e, f = m
    denom = a * d - b * c
    return np.asarray(
        [d / denom, -b / denom, -c / denom, a / denom, (c * f - d * e) / denom, (b * e - a * f) / denom],
        np.float32,
    )


def crop_fits(c: SpatialCoeffs, crop_w: int, crop_h: int, src_w: int, src_h: int) -> bool:
    """All 4 transformed crop corners land inside the source
    (augmentation_layer_base.cpp:131-162)."""
    for x in (0, crop_w - 1):
        for y in (0, crop_h - 1):
            if c.mirror:
                x1, y1 = -x + 0.5 * crop_w, y - 0.5 * crop_h
            else:
                x1, y1 = x - 0.5 * crop_w, y - 0.5 * crop_h
            x2 = math.cos(c.angle) * x1 - math.sin(c.angle) * y1
            y2 = math.sin(c.angle) * x1 + math.cos(c.angle) * y1
            x2 += c.dx * crop_w
            y2 += c.dy * crop_h
            x2 /= c.zoom_x
            y2 /= c.zoom_y
            x2 += 0.5 * src_w
            y2 += 0.5 * src_h
            if math.floor(x2) < 0 or math.floor(x2) > src_w - 2:
                return False
            if math.floor(y2) < 0 or math.floor(y2) > src_h - 2:
                return False
    return True


def sample_valid_spatial_coeffs(
    spec: SpatialAugSpec,
    rng: np.random.Generator,
    *,
    crop_w: int,
    crop_h: int,
    src_w: int,
    src_h: int,
    discount: float = 1.0,
    base: Optional[SpatialCoeffs] = None,
    max_tries: int = 50,
) -> SpatialCoeffs:
    """Rejection-sample coeffs whose crop stays in-bounds
    (generate_valid_spatial_coeffs, augmentation_layer_base.cpp:101-169).
    ``base`` adds incoming coeffs (the img2-relative-to-img1 mode)."""
    base_arr = base or SpatialCoeffs()
    for _ in range(max_tries):
        c = spec.sample(rng, discount)
        # additive composition in coefficient space, like coeff arrays
        c = SpatialCoeffs(
            mirror=float(bool(c.mirror) != bool(base_arr.mirror)),
            dx=c.dx + base_arr.dx,
            dy=c.dy + base_arr.dy,
            angle=c.angle + base_arr.angle,
            zoom_x=c.zoom_x * base_arr.zoom_x,
            zoom_y=c.zoom_y * base_arr.zoom_y,
        )
        if crop_fits(c, crop_w, crop_h, src_w, src_h):
            return c
    return base_arr


# ---------------------------------------------------------------------------
# Chromatic / effect coefficients
# ---------------------------------------------------------------------------


@dataclass
class ChromaticCoeffs:
    gamma: float = 1.0
    brightness: float = 0.0
    contrast: float = 1.0
    color: tuple[float, float, float] = (1.0, 1.0, 1.0)


@dataclass(frozen=True)
class ChromaticAugSpec:
    gamma: Optional[RandomSpec] = None
    brightness: Optional[RandomSpec] = None
    contrast: Optional[RandomSpec] = None
    color: Optional[RandomSpec] = None

    def any(self) -> bool:
        return any(getattr(self, f) is not None for f in ("gamma", "brightness", "contrast", "color"))

    def sample(self, rng: np.random.Generator, discount: float = 1.0) -> ChromaticCoeffs:
        c = ChromaticCoeffs()
        if self.gamma is not None:
            c.gamma = self.gamma.sample(rng, discount)
        if self.brightness is not None:
            c.brightness = self.brightness.sample(rng, discount)
        if self.contrast is not None:
            c.contrast = self.contrast.sample(rng, discount)
        if self.color is not None:
            c.color = tuple(self.color.sample(rng, discount) for _ in range(3))
        return c


@dataclass(frozen=True)
class EffectAugSpec:
    """Effect-family sampling specs (generate_effect_coeffs,
    augmentation_layer_base.cpp:313-336). Noise and shadow have device
    kernels (apply_gaussian_noise / apply_shadow); fog and motion-blur are
    sampled into the coefficient array for blob parity but — exactly like
    the reference kernel, which never implemented them (ApplyEffects,
    data_augmentation_layer.cu:296-318) — have no image effect."""

    noise: Optional[RandomSpec] = None
    shadow_angle: Optional[RandomSpec] = None
    shadow_distance: Optional[RandomSpec] = None
    shadow_strength: Optional[RandomSpec] = None
    fog_amount: Optional[RandomSpec] = None
    fog_size: Optional[RandomSpec] = None
    motion_blur_angle: Optional[RandomSpec] = None
    motion_blur_size: Optional[RandomSpec] = None

    def sample_noise_std(self, rng: np.random.Generator, discount: float = 1.0) -> float:
        return self.noise.sample(rng, discount) if self.noise is not None else 0.0


# ---------------------------------------------------------------------------
# Device-side application (batched, jit-compiled)
# ---------------------------------------------------------------------------


# Conservative intra-tile flow-variation budget of the Pallas warp fast path
# (ops/pallas/warp.py: 16x128 output tiles with SW=384/VW=80 source windows;
# see ops/warp.warp_clamp_fraction for the exact geometry). An affine whose
# derivatives satisfy |du| <= budget across one tile warps EXACTLY on the
# fast path; the sampler rejects the (rare) rotation x zoom-out tail that
# exceeds it when the fast path is active.
PALLAS_WARP_BUDGET = (120.0, 48.0)


def _fast_warp_backend() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def apply_spatial_transform(
    images: jnp.ndarray,
    matrices: jnp.ndarray,
    out_h: int,
    out_w: int,
    *,
    method: str = "auto",
) -> jnp.ndarray:
    """Inverse-warp bilinear crop (SpatialAugmentation kernel,
    data_augmentation_layer.cu:25-70).

    images: (N, H, W, C); matrices: (N, 6) crop→source affine;
    returns (N, out_h, out_w, C). Source samples clamp to borders.

    ``method``:
      "exact" — the 4-tap gather formulation (the parity oracle; the
                default off-accelerator);
      "warp"  — the affine sample expressed as a flow field over the full
                source canvas and routed through the MXU warp fast path
                (ops/warp.flow_warp): TPUs have no gather unit, so the
                gather formulation runs ~20× slower than the same sample
                as one-hot MXU contractions (measured 32 → ~2 ms per
                8×384×512→320×448 batch, v5e). Positions stay f32-exact;
                pixel VALUES compute in bf16 on accelerators (quantization
                ~0.4% — the uint8 source granularity). Affines must respect
                PALLAS_WARP_BUDGET (the sampler enforces it when active;
                mirror-enabled specs must use "exact");
      "auto"  — "warp" on TPU, "exact" elsewhere.
    """
    if method == "auto":
        method = "warp" if _fast_warp_backend() else "exact"
    if method == "warp":
        return _apply_spatial_transform_warp(images, matrices, out_h, out_w)
    n, h, w, c = images.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    t = matrices.astype(jnp.float32)  # (N, 6)
    xpos = t[:, None, None, 0] * xs + t[:, None, None, 2] * ys + t[:, None, None, 4]
    ypos = t[:, None, None, 1] * xs + t[:, None, None, 3] * ys + t[:, None, None, 5]
    xpos = jnp.clip(xpos, 0.0, w - 1.05)  # cu:46-47 clamps into the source
    ypos = jnp.clip(ypos, 0.0, h - 1.05)

    x0 = jnp.floor(xpos).astype(jnp.int32)
    y0 = jnp.floor(ypos).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    ax = (xpos - x0)[..., None]
    ay = (ypos - y0)[..., None]

    flat = images.reshape(n, h * w, c)

    def tap(iy, ix):
        idx = (iy * w + ix).reshape(n, out_h * out_w)
        return jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(n, out_h, out_w, c)

    tl, tr = tap(y0, x0), tap(y0, x1)
    bl, br = tap(y1, x0), tap(y1, x1)
    return (
        (1 - ax) * (1 - ay) * tl
        + ax * (1 - ay) * tr
        + (1 - ax) * ay * bl
        + ax * ay * br
    )


def _affine_positions(matrices: jnp.ndarray, h: int, w: int):
    """Clipped source-position fields of a crop→source affine over the FULL
    (h, w) canvas (the smooth extension keeps the warp fast path's per-tile
    windows tight; the clip reproduces the reference's border clamp,
    data_augmentation_layer.cu:46-47, and matches the exact path's
    w-1.05/h-1.05 tap convention bit for bit)."""
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    t = matrices.astype(jnp.float32)
    xpos = t[:, None, None, 0] * xs + t[:, None, None, 2] * ys + t[:, None, None, 4]
    ypos = t[:, None, None, 1] * xs + t[:, None, None, 3] * ys + t[:, None, None, 5]
    xpos = jnp.clip(xpos, 0.0, w - 1.05)
    ypos = jnp.clip(ypos, 0.0, h - 1.05)
    return xpos - xs[None], ypos - ys[None]


def _apply_spatial_transform_warp(
    images: jnp.ndarray, matrices: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """The affine sample as an MXU flow-warp over the source canvas.

    Geometry is f32-exact (the warp kernels build their one-hot lerp
    weights from f32 positions); on accelerators pixel values ride bf16
    through the fused Pallas kernel. Off-accelerator the exact gather warp
    makes this path equal to the "exact" method (tests/test_aug_warp.py
    pins warp==exact for both the image and GT-flow transforms)."""
    from flownet2_tpu.ops.warp import flow_warp

    n, h, w, c = images.shape
    u, v = _affine_positions(matrices, h, w)
    posflow = jnp.stack([u, v], axis=-1)  # f32: exact sample positions
    if _fast_warp_backend():
        out = flow_warp(images.astype(jnp.bfloat16), posflow, method="pallas")
    else:
        out = flow_warp(images, posflow.astype(images.dtype), method="gather")
    return out[:, :out_h, :out_w].astype(images.dtype)


def apply_chromatic_transform(
    images: jnp.ndarray,
    gamma: jnp.ndarray,
    brightness: jnp.ndarray,
    contrast: jnp.ndarray,
    color: jnp.ndarray,
    *,
    max_multiplier: float = 1.0,
) -> jnp.ndarray:
    """ColorContrastAugmentation (data_augmentation_layer.cu:73-117).

    Per pixel (images scaled to [0,1]): apply per-channel color scaling,
    compute luminance-preserving contrast/brightness around the pixel mean,
    then gamma. Inputs per item: gamma/brightness/contrast (N,), color (N,3).
    """
    x = images.astype(jnp.float32)
    g = gamma[:, None, None, None]
    b = brightness[:, None, None, None]
    ct = contrast[:, None, None, None]
    col = color[:, None, None, :]

    # color & clamp
    x = jnp.clip(x * col, 0.0, max_multiplier)
    # brightness/contrast around the per-pixel channel mean
    mean = jnp.mean(x, axis=-1, keepdims=True)
    x = jnp.clip((x - mean) * ct + mean + b, 0.0, max_multiplier)
    # gamma
    x = jnp.clip(x, 0.0, max_multiplier) ** g
    return x.astype(images.dtype)


def apply_gaussian_noise(
    images: jnp.ndarray, noise_std: jnp.ndarray, key: jax.Array, *, max_multiplier: float = 1.0
) -> jnp.ndarray:
    """Additive gaussian noise (data_augmentation_layer.cu:579-586 via
    cuRAND; here jax.random.normal threaded through the train step)."""
    noise = jax.random.normal(key, images.shape, jnp.float32)
    out = images.astype(jnp.float32) + noise * noise_std[:, None, None, None]
    return jnp.clip(out, 0.0, max_multiplier).astype(images.dtype)


def _nearest_sample_warp(values: jnp.ndarray, matrices: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour affine sample of (N, H, W, C) values over the full
    source canvas via the MXU warp: positions round to integers BEFORE the
    warp, so every bilinear weight is exactly 0 or 1 and the values pass
    through unchanged (one-hot row × value on the MXU is exact in f32) —
    the GT-flow sampling path must not quantize (EPE parity)."""
    from flownet2_tpu.ops.warp import flow_warp

    n, h, w, c = values.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    t = matrices.astype(jnp.float32)
    xpos = t[:, None, None, 0] * xs + t[:, None, None, 2] * ys + t[:, None, None, 4]
    ypos = t[:, None, None, 1] * xs + t[:, None, None, 3] * ys + t[:, None, None, 5]
    xi = jnp.clip(jnp.round(xpos), 0.0, w - 1)
    yi = jnp.clip(jnp.round(ypos), 0.0, h - 1)
    posflow = jnp.stack([xi - xs[None], yi - ys[None]], axis=-1)
    method = "pallas" if _fast_warp_backend() else "gather"
    # NaN-encoded invalid GT pixels would smear through the one-hot MXU
    # contraction (0 x NaN = NaN poisons the whole source window): warp a
    # clean copy plus a per-channel NaN mask (0/1 samples exactly under
    # one-hot weights) and re-plant the NaNs afterwards.
    vals = values.astype(jnp.float32)
    nan_mask = jnp.isnan(vals)
    packed = jnp.concatenate(
        [jnp.where(nan_mask, 0.0, vals), nan_mask.astype(jnp.float32)], axis=-1
    )
    out = flow_warp(packed, posflow, method=method)
    sampled, mask = out[..., :c], out[..., c:]
    return jnp.where(mask > 0.5, jnp.float32(jnp.nan), sampled)


def apply_flow_augmentation(
    flows: jnp.ndarray,
    inv_mat1: jnp.ndarray,
    mat2: jnp.ndarray,
    out_h: int,
    out_w: int,
    *,
    method: str = "auto",
) -> jnp.ndarray:
    """Transform GT flow consistently with both image transforms
    (flow_augmentation_layer.cu:24-89).

    For each target pixel p: s = A1⁻¹·p (source position via img1's inverse),
    f = nearest-sample(flow, s), target2 = A2·(s + f) in img2's crop frame,
    new flow = target2 - p. flows: (N, H, W, 2) source-resolution GT;
    inv_mat1: (N, 6) source→crop1... note: the reference passes img1's
    crop→source matrix and applies it directly to target coords (its
    matrices already map crop→source), then img2's source→crop (inverse)
    matrix; arguments here follow that convention: ``inv_mat1`` maps crop
    pixel → source pixel, ``mat2`` maps source pixel → crop2 pixel.

    ``method``: "exact" (gather nearest-sample), "warp" (the nearest sample
    as an integer-position MXU flow-warp — the one-hot weights are exactly
    {0, 1}, so f32 GT values pass through BIT-EXACT while avoiding the
    TPU's slow gather path), or "auto" ("warp" on TPU).
    """
    if method == "auto":
        method = "warp" if _fast_warp_backend() else "exact"
    n, h, w, _ = flows.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)

    t1 = inv_mat1.astype(jnp.float32)
    xsrc = t1[:, None, None, 0] * xs + t1[:, None, None, 2] * ys + t1[:, None, None, 4]
    ysrc = t1[:, None, None, 1] * xs + t1[:, None, None, 3] * ys + t1[:, None, None, 5]

    if method == "warp":
        f = _nearest_sample_warp(flows, inv_mat1)[:, :out_h, :out_w]
    else:
        # nearest-sample the source flow (cu:52-58)
        xi = jnp.clip(jnp.round(xsrc).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(ysrc).astype(jnp.int32), 0, h - 1)
        flat = flows.reshape(n, h * w, 2)
        idx = (yi * w + xi).reshape(n, out_h * out_w)
        f = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(
            n, out_h, out_w, 2
        )

    x2 = xsrc + f[..., 0]
    y2 = ysrc + f[..., 1]
    t2 = mat2.astype(jnp.float32)
    xt2 = t2[:, None, None, 0] * x2 + t2[:, None, None, 2] * y2 + t2[:, None, None, 4]
    yt2 = t2[:, None, None, 1] * x2 + t2[:, None, None, 3] * y2 + t2[:, None, None, 5]

    return jnp.stack([xt2 - xs, yt2 - ys], axis=-1)


def apply_black_augmentation(
    images: jnp.ndarray,
    flows: jnp.ndarray,
    black_mask: jnp.ndarray,
    border_frac: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BlackAugmentation (black_augmentation_layer.cu:14-60): zero whole
    image+flow pairs, or zero a border band of ``border_frac`` of the size.

    black_mask: (N,) {0,1}; border_frac: (N,) in [0, 0.5).
    """
    n, h, w, _ = images.shape
    keep = (1.0 - black_mask)[:, None, None, None]
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None]
    bw = border_frac[:, None, None] * w
    bh = border_frac[:, None, None] * h
    inside = (
        (xs >= bw) & (xs < w - bw) & (ys >= bh) & (ys < h - bh)
    ).astype(jnp.float32)[..., None]
    mask = keep * inside
    return images * mask, flows * mask


# ---------------------------------------------------------------------------
# Chromatic-eigen augmentation (the reference's eigenspace pow/add/mult on
# luminance / saturation / color axes; ComputeChromaticEigenspace +
# ChromaticEigenAugmentation, data_augmentation_layer.cu:119-290, stats
# finalized at :495-535).
# ---------------------------------------------------------------------------

# Default RGB eigenvectors of natural-image statistics (rows = eigenvectors;
# the released FlowNet2 training templates pass these via chromatic_eigvec).
DEFAULT_CHROMATIC_EIGVEC = np.asarray(
    [
        [0.51, 0.56, 0.65],
        [0.79, 0.01, -0.62],
        [0.35, -0.83, 0.44],
    ],
    np.float32,
)


@dataclass
class ChromaticEigenCoeffs:
    """Per-item coefficients (AugmentationCoeff eigen fields). Defaults are
    the identity transform."""

    pow_nomean: tuple[float, float, float] = (1.0, 1.0, 1.0)
    add_nomean: tuple[float, float, float] = (0.0, 0.0, 0.0)
    mult_nomean: tuple[float, float, float] = (1.0, 1.0, 1.0)
    pow_withmean: tuple[float, float, float] = (1.0, 1.0, 1.0)
    add_withmean: tuple[float, float, float] = (0.0, 0.0, 0.0)
    mult_withmean: tuple[float, float, float] = (1.0, 1.0, 1.0)
    lmult_pow: float = 1.0
    lmult_add: float = 0.0
    lmult_mult: float = 1.0
    col_angle: float = 0.0


@dataclass(frozen=True)
class ChromaticEigenAugSpec:
    """Sampling spec; field mapping per generate_chromatic_eigen_coeffs
    (augmentation_layer_base.cpp:264-312): ladd_* drive the nomean[0] and
    (pow only, via defaults) withmean[0] channel, col_* drive nomean[1,2],
    sat_* drive withmean[1,2], lmult_* the final luminance path."""

    ladd_pow: Optional[RandomSpec] = None
    ladd_add: Optional[RandomSpec] = None
    ladd_mult: Optional[RandomSpec] = None
    col_pow: Optional[RandomSpec] = None
    col_add: Optional[RandomSpec] = None
    col_mult: Optional[RandomSpec] = None
    sat_pow: Optional[RandomSpec] = None
    sat_add: Optional[RandomSpec] = None
    sat_mult: Optional[RandomSpec] = None
    lmult_pow: Optional[RandomSpec] = None
    lmult_add: Optional[RandomSpec] = None
    lmult_mult: Optional[RandomSpec] = None
    col_rotate: Optional[RandomSpec] = None

    def any(self) -> bool:
        return any(
            getattr(self, n) is not None
            for n in (
                "ladd_pow", "ladd_add", "ladd_mult", "col_pow", "col_add",
                "col_mult", "sat_pow", "sat_add", "sat_mult", "lmult_pow",
                "lmult_add", "lmult_mult", "col_rotate",
            )
        )

    def sample(self, rng: np.random.Generator, discount: float = 1.0) -> ChromaticEigenCoeffs:
        c = ChromaticEigenCoeffs()

        def s(spec):
            return spec.sample(rng, discount)

        pn = list(c.pow_nomean); an = list(c.add_nomean); mn = list(c.mult_nomean)
        pw = list(c.pow_withmean); aw = list(c.add_withmean); mw = list(c.mult_withmean)
        if self.ladd_pow is not None:
            pn[0] = s(self.ladd_pow)
        if self.col_pow is not None:
            pn[1] = s(self.col_pow)
            pn[2] = s(self.col_pow)
        if self.ladd_add is not None:
            an[0] = s(self.ladd_add)
        if self.col_add is not None:
            an[1] = s(self.col_add)
            an[2] = s(self.col_add)
        if self.ladd_mult is not None:
            mn[0] = s(self.ladd_mult)
        if self.col_mult is not None:
            mn[1] = s(self.col_mult)
            mn[2] = s(self.col_mult)
        if self.sat_pow is not None:
            pw[1] = pw[2] = s(self.sat_pow)
        if self.sat_add is not None:
            aw[1] = aw[2] = s(self.sat_add)
        if self.sat_mult is not None:
            mw[1] = mw[2] = s(self.sat_mult)
        c.pow_nomean = tuple(pn); c.add_nomean = tuple(an); c.mult_nomean = tuple(mn)
        c.pow_withmean = tuple(pw); c.add_withmean = tuple(aw); c.mult_withmean = tuple(mw)
        if self.lmult_pow is not None:
            c.lmult_pow = s(self.lmult_pow)
        if self.lmult_add is not None:
            c.lmult_add = s(self.lmult_add)
        if self.lmult_mult is not None:
            c.lmult_mult = s(self.lmult_mult)
        if self.col_rotate is not None:
            c.col_angle = s(self.col_rotate)
        return c


def _signed_pow(x, p):
    return jnp.sign(x) * jnp.abs(x) ** p


def apply_chromatic_eigen_transform(
    images: jnp.ndarray,
    coeffs: dict[str, jnp.ndarray],
    *,
    eigvec: np.ndarray = DEFAULT_CHROMATIC_EIGVEC,
    max_multiplier: float = 1.0,
) -> jnp.ndarray:
    """Batched eigen-space chromatic transform.

    images: (N, H, W, 3) in [0, max_multiplier]. ``coeffs`` arrays (stacked
    per item): pow_nomean/add_nomean/mult_nomean/pow_withmean/add_withmean/
    mult_withmean (N,3), lmult_pow/lmult_add/lmult_mult/col_angle (N,).
    Statistics (mean_rgb, max_abs_eig, max_l) are computed over the whole
    batch, matching the reference's single shared eigenspace struct.
    """
    x = images.astype(jnp.float32)
    ev = jnp.asarray(eigvec)  # (3 eig, 3 rgb)

    eig_all = jnp.einsum("er,nhwr->nhwe", ev, x)
    mean_rgb = jnp.mean(x, axis=(0, 1, 2))  # (3,)
    max_abs_eig = jnp.max(jnp.abs(eig_all), axis=(0, 1, 2))  # (3,)
    mean_eig = ev @ mean_rgb
    big = max_abs_eig > 1e-2
    mean_eig = jnp.where(big, mean_eig / jnp.where(big, max_abs_eig, 1.0), mean_eig)
    max_l = jnp.sqrt(jnp.sum(jnp.square(max_abs_eig)))

    def bcast(v):  # (N,k) -> (N,1,1,k)
        return v[:, None, None]

    rgb = x - mean_rgb
    eig = jnp.einsum("er,nhwr->nhwe", ev, rgb)

    # nomean: normalize, signed pow, add, mult (per eigen channel)
    e_norm = eig / jnp.where(big, max_abs_eig, 1.0)
    e_tr = _signed_pow(e_norm, bcast(coeffs["pow_nomean"]))
    e_tr = (e_tr + bcast(coeffs["add_nomean"])) * bcast(coeffs["mult_nomean"])
    eig = jnp.where(big, e_tr, eig)

    # re-add normalized mean
    eig = eig + mean_eig

    # withmean channel 0 (luminance axis)
    e0 = _signed_pow(eig[..., 0], coeffs["pow_withmean"][:, None, None, 0])
    e0 = (e0 + coeffs["add_withmean"][:, None, None, 0]) * coeffs["mult_withmean"][
        :, None, None, 0
    ]
    eig = jnp.where(big[0], eig.at[..., 0].set(e0), eig)

    # saturation path on channels 1,2
    s = jnp.sqrt(jnp.square(eig[..., 1]) + jnp.square(eig[..., 2]))
    s_big = s > 1e-2
    s1 = s ** coeffs["pow_withmean"][:, None, None, 1]
    s1 = jnp.maximum(s1 + coeffs["add_withmean"][:, None, None, 1], 0.0)
    s1 = s1 * coeffs["mult_withmean"][:, None, None, 1]
    s1 = jnp.where(s_big, s1, s)

    # color rotation in the (1,2) plane
    ang = coeffs["col_angle"][:, None, None]
    c1 = jnp.cos(ang) * eig[..., 1] - jnp.sin(ang) * eig[..., 2]
    c2 = jnp.sin(ang) * eig[..., 1] + jnp.cos(ang) * eig[..., 2]
    eig = jnp.stack([eig[..., 0], c1, c2], axis=-1)

    # un-normalize
    eig = eig * jnp.where(big, max_abs_eig, 1.0)

    l_big = max_l > 1e-2
    l1_pre = jnp.sqrt(jnp.sum(jnp.square(eig), axis=-1)) / jnp.where(l_big, max_l, 1.0)

    # apply saturation rescale
    s_safe = jnp.where(s_big, s, 1.0)
    eig = eig.at[..., 1].set(jnp.where(s_big, eig[..., 1] / s_safe * s1, eig[..., 1]))
    eig = eig.at[..., 2].set(jnp.where(s_big, eig[..., 2] / s_safe * s1, eig[..., 2]))

    # luminance rescale
    l = jnp.sqrt(jnp.sum(jnp.square(eig), axis=-1))
    l1 = l1_pre ** coeffs["lmult_pow"][:, None, None]
    l1 = jnp.maximum(l1 + coeffs["lmult_add"][:, None, None], 0.0)
    l1 = l1 * coeffs["lmult_mult"][:, None, None] * max_l
    l_px_big = l > 1e-2
    scale = jnp.where(l_px_big & l_big, l1 / jnp.where(l_px_big, l, 1.0), 1.0)
    eig_scaled = eig * scale[..., None]
    eig_scaled = jnp.minimum(eig_scaled, max_abs_eig)
    eig = jnp.where(l_big, eig_scaled, eig)

    # reconstruction: rgb[c] = Σ_e eigvec[e,c] · eig[e] (cu:285-288)
    out = jnp.einsum("ec,nhwe->nhwc", ev, eig)
    out = jnp.clip(out, 0.0, max_multiplier)
    return out.astype(images.dtype)


def apply_shadow(
    images: jnp.ndarray,
    shadow_nx: jnp.ndarray,
    shadow_ny: jnp.ndarray,
    shadow_distance: jnp.ndarray,
    shadow_strength: jnp.ndarray,
    *,
    max_multiplier: float = 1.0,
) -> jnp.ndarray:
    """The reference's effect kernel (ApplyEffects,
    data_augmentation_layer.cu:296-318): darken the half-plane
    (x-W/2)·nx + (y-H/2)·ny > distance by ``strength``, then clamp.

    Note the reference's tEffectCoeffs also carries fog_amount/fog_size/
    motion_blur_* fields, but its GPU kernel never applies them — only the
    shadow (and the separate gaussian noise). We mirror that: fog/motion-blur
    specs are accepted by EffectAugSpec for config parity and ignored.
    Per-item arrays: nx/ny (cos/sin of shadow_angle), distance, strength.
    """
    n, h, w, _ = images.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - w / 2
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - h / 2
    plane = (
        xs[None] * shadow_nx[:, None, None]
        + ys[None] * shadow_ny[:, None, None]
        - shadow_distance[:, None, None]
    )
    shaded = images.astype(jnp.float32) - (plane > 0)[..., None] * shadow_strength[
        :, None, None, None
    ]
    return jnp.clip(shaded, 0.0, max_multiplier).astype(images.dtype)


# ---------------------------------------------------------------------------
# Vectorized host sampling (fast path for the training loader)
# ---------------------------------------------------------------------------


def _sample_spec_n(spec: Optional[RandomSpec], rng: np.random.Generator, n: int, discount: float) -> np.ndarray:
    """Vectorized RandomSpec sampling: n draws at once (same distributions as
    RandomSpec.sample; the draw ORDER differs from the reference's scalar
    sequence, which we don't claim bit-parity for)."""
    if spec is None:
        return np.zeros(n, np.float64)
    spread = spec.spread * discount if spec.apply_schedule else spec.spread
    t = spec.rand_type
    if t == "uniform":
        v = rng.uniform(spec.mean - spread, spec.mean + spread, n) if spread > 0 else np.full(n, spec.mean)
        if spec.exp:
            v = np.exp(v)
    elif t == "gaussian":
        v = rng.normal(spec.mean, spread, n) if spread > 0 else np.full(n, spec.mean)
        if spec.exp:
            v = np.exp(v)
    elif t == "bernoulli":
        v = (rng.uniform(size=n) < spec.prob).astype(np.float64) if spec.prob > 0 else np.zeros(n)
    elif t in ("uniform_bernoulli", "gaussian_bernoulli"):
        on = (rng.uniform(size=n) < spec.prob) if spec.prob > 0 else np.zeros(n, bool)
        if spread > 0:
            raw = (
                rng.uniform(spec.mean - spread, spec.mean + spread, n)
                if t == "uniform_bernoulli"
                else rng.normal(spec.mean, spread, n)
            )
        else:
            raw = np.full(n, spec.mean)
        v = np.where(on, raw, 0.0)
        if spec.exp:
            v = np.exp(v)
    else:
        raise ValueError(f"unknown rand_type {t!r}")
    if spec.discretize:
        v = np.round(v)
    return spec.multiplier * v


def spatial_corner_valid(
    mirror, dx, dy, angle, zx, zy, *, crop_w, crop_h, src_w, src_h
):
    """Vectorized corner-validity of candidate spatial coeffs: all 4 crop
    corners land inside the source (generate_valid_spatial_coeffs corner
    math, augmentation_layer_base.cpp:101-169)."""
    valid = np.ones(np.shape(angle), bool)
    for cx in (0, crop_w - 1):
        for cy in (0, crop_h - 1):
            x1 = np.where(mirror.astype(bool), -cx + 0.5 * crop_w, cx - 0.5 * crop_w)
            y1 = cy - 0.5 * crop_h
            ca, sa = np.cos(angle), np.sin(angle)
            x2 = ca * x1 - sa * y1 + dx * crop_w
            y2 = sa * x1 + ca * y1 + dy * crop_h
            x2 = x2 / zx + 0.5 * src_w
            y2 = y2 / zy + 0.5 * src_h
            valid &= (np.floor(x2) >= 0) & (np.floor(x2) <= src_w - 2)
            valid &= (np.floor(y2) >= 0) & (np.floor(y2) <= src_h - 2)
    return valid


def spatial_budget_valid(mirror, angle, zx, zy, warp_budget):
    """Whether candidate coeffs' affine derivatives fit the MXU warp fast
    path's intra-tile window budget (soundness property-tested against
    warp_clamp_fraction in tests/test_aug_warp.py).

    Derivatives of the crop→source map (see spatial_corner_valid):
    d(x2)/d(cx) = ±cos/zx, d(x2)/d(cy) = -sin/zx, etc. Intra-tile flow
    variation over the Pallas warp's 16x128 output tiles must fit the
    source windows; u = x2 - cx shifts the x-derivative by -1."""
    ca, sa = np.cos(angle), np.sin(angle)
    sgn = np.where(np.asarray(mirror).astype(bool), -1.0, 1.0)
    bu, bv = warp_budget
    ok = np.abs(sgn * ca / zx - 1.0) * 127 + np.abs(sa / zx) * 15 <= bu
    ok &= np.abs(sgn * sa / zy) * 127 + np.abs(ca / zy - 1.0) * 15 <= bv
    return ok


def sample_valid_spatial_coeffs_batch(
    spec: SpatialAugSpec,
    rng: np.random.Generator,
    *,
    n_items: int,
    crop_w: int,
    crop_h: int,
    src_w: int,
    src_h: int,
    discount: float = 1.0,
    base: Optional[np.ndarray] = None,
    max_tries: int = 50,
    warp_budget: Optional[tuple] = None,
) -> np.ndarray:
    """Vectorized rejection sampling: (n_items, 6) coeff rows
    [mirror, dx, dy, angle, zoom_x, zoom_y], all candidates evaluated at once
    (the scalar path loops items × ≤50 tries in python — too slow for a
    loader thread on small hosts).

    ``base``: optional (n_items, 6) incoming coeffs composed additively (the
    img2-relative mode). Items with no valid candidate fall back to base /
    identity, mirroring the reference's max-tries warning path.

    ``warp_budget``: optional (horizontal, vertical) intra-tile budget
    (PALLAS_WARP_BUDGET); when set, candidates whose affine derivatives
    would exceed the MXU warp fast path's window budget are rejected like
    out-of-bounds crops, so device-side augmentation warps are exact. Only
    the extreme joint rotation × zoom-out tail is affected (the truncation
    is part of the documented divergence from the reference's unbounded
    sampler; pass None to keep the full distribution with the exact warp).
    """
    k = max_tries
    total = n_items * k
    mirror = _sample_spec_n(spec.mirror, rng, total, discount)
    if spec.translate is not None:
        dx = _sample_spec_n(spec.translate, rng, total, discount)
        dy = _sample_spec_n(spec.translate, rng, total, discount)
    else:
        dx = np.zeros(total)
        dy = np.zeros(total)
    if spec.translate_x is not None:
        dx = _sample_spec_n(spec.translate_x, rng, total, discount)
    if spec.translate_y is not None:
        dy = _sample_spec_n(spec.translate_y, rng, total, discount)
    angle = _sample_spec_n(spec.rotate, rng, total, discount)
    if spec.zoom is not None:
        zx = _sample_spec_n(spec.zoom, rng, total, discount)
    else:
        zx = np.ones(total)
    zy = zx.copy()
    if spec.squeeze is not None:
        sq = _sample_spec_n(spec.squeeze, rng, total, discount)
        zx = zx * sq
        zy = zy / sq

    if base is not None:
        b = np.repeat(np.asarray(base, np.float64), k, axis=0)
        mirror = (mirror.astype(bool) ^ b[:, 0].astype(bool)).astype(np.float64)
        dx = dx + b[:, 1]
        dy = dy + b[:, 2]
        angle = angle + b[:, 3]
        zx = zx * np.where(b[:, 4] == 0, 1.0, b[:, 4])
        zy = zy * np.where(b[:, 5] == 0, 1.0, b[:, 5])

    valid = spatial_corner_valid(
        mirror, dx, dy, angle, zx, zy,
        crop_w=crop_w, crop_h=crop_h, src_w=src_w, src_h=src_h,
    )
    if warp_budget is not None:
        valid &= spatial_budget_valid(mirror, angle, zx, zy, warp_budget)

    cand = np.stack([mirror, dx, dy, angle, zx, zy], axis=1).reshape(n_items, k, 6)
    valid = valid.reshape(n_items, k)
    first = np.argmax(valid, axis=1)
    any_valid = valid.any(axis=1)
    out = cand[np.arange(n_items), first]
    fallback = (
        np.asarray(base, np.float64)
        if base is not None
        else np.tile(np.asarray([0, 0, 0, 0, 1, 1], np.float64), (n_items, 1))
    )
    out = np.where(any_valid[:, None], out, fallback)
    return out.astype(np.float32)
