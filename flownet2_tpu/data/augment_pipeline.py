"""The training augmentation pipeline: host coefficient sampling + device
application, glued into BatchLoader and the training objectives.

Replaces the reference's DataAugmentation/GenerateAugmentationParameters/
FlowAugmentation layer trio (SURVEY.md §2.2, §3.2 training call stack):

- host (this module, inside the loader threads): sample per-item valid
  spatial affines for frame 1, offset affines for frame 2 (paired-coeff
  sharing — the coeff-blob plumbing of data_augmentation_layer.cu:349-350),
  chromatic coefficients, and a noise std; attach them to the batch as
  small arrays;
- device (``apply_augmentation_device``, called inside the jitted loss):
  batched inverse-affine warps of both images, the consistent GT flow
  transform, chromatic adjustment, and gaussian noise.

Default coefficient distributions approximate the released FlowNet2
training templates (the prototxts are downloaded, not in-tree —
models/download-models.sh): translate ±0.4 (fraction of crop), rotate
±0.4 rad, log-zoom N-ish uniform exp(0.2±0.4), squeeze exp(±0.3),
chromatic gamma/brightness/contrast/color, gaussian noise spread 0.04.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from flownet2_tpu.ops.augment import (
    ChromaticAugSpec,
    CoeffSchedule,
    EffectAugSpec,
    RandomSpec,
    SpatialAugSpec,
    SpatialCoeffs,
    apply_chromatic_transform,
    apply_flow_augmentation,
    apply_gaussian_noise,
    apply_spatial_transform,
    invert_affine,
    sample_valid_spatial_coeffs,
    spatial_matrix,
)


@dataclass(frozen=True)
class FlowNetAugConfig:
    spatial: SpatialAugSpec = SpatialAugSpec(
        mirror=None,  # mirroring breaks flow sign conventions; ref nets omit it
        translate=RandomSpec("uniform_bernoulli", mean=0.0, spread=0.4, prob=1.0),
        rotate=RandomSpec("uniform_bernoulli", mean=0.0, spread=0.4, prob=1.0),
        zoom=RandomSpec("uniform_bernoulli", exp=True, mean=0.2, spread=0.4, prob=1.0),
        squeeze=RandomSpec("uniform_bernoulli", exp=True, mean=0.0, spread=0.3, prob=1.0),
    )
    # frame-2 offset relative to frame 1 (the GenerateAugmentationParameters
    # "add" mode): small relative translate/rotate/zoom.
    spatial_offset: SpatialAugSpec = SpatialAugSpec(
        translate=RandomSpec("gaussian_bernoulli", mean=0.0, spread=0.03, prob=1.0),
        rotate=RandomSpec("gaussian_bernoulli", mean=0.0, spread=0.03, prob=1.0),
        zoom=RandomSpec("gaussian_bernoulli", exp=True, mean=0.0, spread=0.03, prob=1.0),
    )
    chromatic: ChromaticAugSpec = ChromaticAugSpec(
        gamma=RandomSpec("gaussian_bernoulli", exp=True, mean=0.0, spread=0.02, prob=1.0),
        brightness=RandomSpec("gaussian_bernoulli", mean=0.0, spread=0.02, prob=1.0),
        contrast=RandomSpec("gaussian_bernoulli", exp=True, mean=0.0, spread=0.02, prob=1.0),
        color=RandomSpec("gaussian_bernoulli", exp=True, mean=0.0, spread=0.02, prob=1.0),
    )
    effect: EffectAugSpec = EffectAugSpec(
        noise=RandomSpec("uniform_bernoulli", mean=0.03, spread=0.03, prob=1.0)
    )
    schedule: CoeffSchedule = CoeffSchedule(half_life=50000, initial_coeff=0.5, final_coeff=1.0)


def spatial_method_for(config: FlowNetAugConfig) -> str:
    """The device-side ``spatial_method`` a config requires.

    Mirror-enabled specs must take the exact gather path: a mirrored affine
    has |du/dx| ≈ 2 (≈254 px across one 128-column warp tile), far beyond the
    Pallas window budget, and ``sample_aug_arrays`` skips the budget
    rejection for mirrored specs — so routing them through "warp" would
    silently clamp to window edges (ADVICE r4 #3). ``make_augmented_loss``
    derives its method from the same config via this helper, closing the
    sampler/device agreement loop.
    """
    if config.spatial.mirror is not None or config.spatial_offset.mirror is not None:
        return "exact"
    return "auto"


def sample_aug_arrays(
    config: FlowNetAugConfig,
    rng: np.random.Generator,
    n: int,
    src_h: int,
    src_w: int,
    crop_h: int,
    crop_w: int,
    discount: float = 1.0,
) -> dict:
    """Sample the per-item augmentation coefficient arrays for a batch of
    ``n`` items at source resolution (src_h, src_w) — no pixel data needed
    (coefficients depend only on geometry). Returns the ``aug_*`` dict that
    :func:`apply_augmentation_device` consumes."""
    from flownet2_tpu.ops.augment import (
        PALLAS_WARP_BUDGET,
        _fast_warp_backend,
        _sample_spec_n,
        sample_valid_spatial_coeffs_batch,
    )

    # When the device side will take the MXU warp fast path (TPU), reject
    # the rare rotation×zoom-out tail its window budget can't sample
    # exactly (apply_spatial_transform method="warp" docstring). Mirrored
    # specs skip the budget AND are routed onto the exact path by
    # make_augmented_loss via spatial_method_for (the same mirror test).
    budget = (
        PALLAS_WARP_BUDGET
        if _fast_warp_backend()
        and config.spatial.mirror is None
        and config.spatial_offset.mirror is None
        else None
    )
    geo = dict(crop_w=crop_w, crop_h=crop_h, src_w=src_w, src_h=src_h)
    c0 = sample_valid_spatial_coeffs_batch(
        config.spatial, rng, n_items=n, discount=discount, warp_budget=budget, **geo
    )
    c1 = sample_valid_spatial_coeffs_batch(
        config.spatial_offset, rng, n_items=n, discount=discount, base=c0,
        warp_budget=budget, **geo
    )
    m0 = np.zeros((n, 6), np.float32)
    m1 = np.zeros((n, 6), np.float32)
    inv1 = np.zeros((n, 6), np.float32)
    for i in range(n):
        a0 = spatial_matrix(
            SpatialCoeffs(*(float(v) for v in c0[i])), crop_w, crop_h, src_w, src_h
        )
        a1 = spatial_matrix(
            SpatialCoeffs(*(float(v) for v in c1[i])), crop_w, crop_h, src_w, src_h
        )
        m0[i] = a0
        m1[i] = a1
        inv1[i] = invert_affine(a1)

    ch = config.chromatic
    one = np.ones((n,), np.float32)
    gamma = _sample_spec_n(ch.gamma, rng, n, discount).astype(np.float32) if ch.gamma else one
    brightness = _sample_spec_n(ch.brightness, rng, n, discount).astype(np.float32) if ch.brightness else one * 0
    contrast = _sample_spec_n(ch.contrast, rng, n, discount).astype(np.float32) if ch.contrast else one
    if ch.color is not None:
        color = np.stack(
            [_sample_spec_n(ch.color, rng, n, discount) for _ in range(3)], axis=1
        ).astype(np.float32)
    else:
        color = np.ones((n, 3), np.float32)
    if config.effect.noise is not None:
        noise = np.maximum(
            _sample_spec_n(config.effect.noise, rng, n, discount), 0.0
        ).astype(np.float32)
    else:
        noise = np.zeros((n,), np.float32)
    return dict(
        aug_mat0=m0,
        aug_mat1=m1,
        aug_inv_mat1=inv1,
        aug_gamma=gamma,
        aug_brightness=brightness,
        aug_contrast=contrast,
        aug_color=color,
        aug_noise=noise,
    )


def make_flownet_augmenter(
    crop_h: int,
    crop_w: int,
    config: FlowNetAugConfig = FlowNetAugConfig(),
) -> Callable[[dict, np.random.Generator], dict]:
    """Host-side transform for BatchLoader: attach per-item aug arrays.

    The returned batch gains:
      aug_mat0/aug_mat1      (N, 6)  crop→source affines for each frame
      aug_inv_mat1           (N, 6)  source→crop affine for frame 2
      aug_gamma/brightness/contrast (N,), aug_color (N, 3), aug_noise (N,)
    Images/flow stay at source resolution; the device side produces crops.
    """

    def transform(batch: dict, rng: np.random.Generator) -> dict:
        n, src_h, src_w = batch["img0"].shape[:3]
        # iteration isn't known host-side; callers can pre-scale spreads.
        batch = dict(batch)
        batch.update(
            sample_aug_arrays(config, rng, n, src_h, src_w, crop_h, crop_w)
        )
        return batch

    return transform


def apply_augmentation_device(
    batch: dict,
    key: jax.Array,
    crop_h: int,
    crop_w: int,
    *,
    mean_window: int = 0,
    mean_per_pixel: bool = False,
    spatial_method: str = "auto",
) -> dict:
    """Device-side application (inside the jitted train step).

    Consumes the aug_* arrays; returns {img0, img1, flow} at crop
    resolution, images still in the 0-255 range (chromatic ops run in the
    [0,1] domain like the reference training nets, which rescale via an
    Eltwise 1/255 before augmentation).

    Mean handling (recompute_mean / mean_per_pixel / fixed mean,
    data_augmentation_layer.cu:592-635): when the batch carries
    ``mean_image0``/``mean_image1`` + ``mean_iter`` (attached by
    :class:`~flownet2_tpu.data.mean.MeanRecompute`), the running-mean
    recursion updates and subtracts inside the step and the per-frame batch
    means come back under ``aug_batch_mean0/1`` for the host mirror. A
    ``mean_rgb`` batch entry subtracts a fixed per-channel mean instead.
    Subtraction happens in the [0,1] augmented domain, like the reference.
    """
    img0 = apply_spatial_transform(
        batch["img0"].astype(jnp.float32) / 255.0, batch["aug_mat0"], crop_h, crop_w,
        method=spatial_method,
    )
    img1 = apply_spatial_transform(
        batch["img1"].astype(jnp.float32) / 255.0, batch["aug_mat1"], crop_h, crop_w,
        method=spatial_method,
    )
    from flownet2_tpu.core.codec import flow_as_f32_device

    flow = apply_flow_augmentation(
        flow_as_f32_device(batch["flow"]),
        batch["aug_mat0"],
        batch["aug_inv_mat1"],
        crop_h,
        crop_w,
        method=spatial_method,
    )
    # chromatic applies to both frames with the same coefficients
    k0, k1 = jax.random.split(key)
    img0 = apply_chromatic_transform(
        img0, batch["aug_gamma"], batch["aug_brightness"], batch["aug_contrast"], batch["aug_color"]
    )
    img1 = apply_chromatic_transform(
        img1, batch["aug_gamma"], batch["aug_brightness"], batch["aug_contrast"], batch["aug_color"]
    )
    img0 = apply_gaussian_noise(img0, batch["aug_noise"], k0)
    img1 = apply_gaussian_noise(img1, batch["aug_noise"], k1)

    extra = {}
    if "mean_image0" in batch or "mean_image1" in batch:
        from flownet2_tpu.data.mean import recompute_mean_and_subtract

        num_iter = batch["mean_iter"]
        for name, img in (("0", img0), ("1", img1)):
            if f"mean_image{name}" not in batch:
                continue
            img, bm = recompute_mean_and_subtract(
                img,
                batch[f"mean_image{name}"],
                num_iter,
                window=mean_window,
                per_pixel=mean_per_pixel,
            )
            extra[f"aug_batch_mean{name}"] = bm
            if name == "0":
                img0 = img
            else:
                img1 = img
    elif "mean_rgb" in batch:
        from flownet2_tpu.data.mean import subtract_fixed_mean

        img0 = subtract_fixed_mean(img0, batch["mean_rgb"])
        img1 = subtract_fixed_mean(img1, batch["mean_rgb"])

    from flownet2_tpu.parallel.annotate import constrain_act

    out = {"img0": img0 * 255.0, "img1": img1 * 255.0, "flow": flow}
    out = {k: constrain_act(v) for k, v in out.items()}
    out.update(extra)
    return out


def write_augmented(
    batch: dict,
    folder: str,
    iteration: int,
    crop_h: int,
    crop_w: int,
    *,
    log: Callable[[str], None] = print,
) -> list[str]:
    """The ``write_augmented`` debug option (AugmentationParameter,
    caffe.proto:492; data_augmentation_layer.cu:413-439): log the sampled
    coefficients per item and dump the augmented images to disk.

    Runs the augmentation eagerly on the host batch (debug path — not in
    the train step) and writes ``{folder}/aug0_NNNNNNN(nnn).ppm`` /
    ``aug1_...`` via the Writer layer analogue. Returns written paths.
    """
    import jax as _jax

    from flownet2_tpu.tools.writers import Writer

    n = batch["img0"].shape[0]
    for i in range(n):
        m = np.asarray(batch["aug_mat0"][i])
        log(
            f"Augmenting {i}, affine0: [{', '.join(f'{v:.4f}' for v in m)}], "
            f"gamma: {float(batch['aug_gamma'][i]):.4f}, "
            f"brightness: {float(batch['aug_brightness'][i]):.4f}, "
            f"contrast: {float(batch['aug_contrast'][i]):.4f}, "
            f"color: {np.asarray(batch['aug_color'][i]).round(4).tolist()}, "
            f"noise: {float(batch['aug_noise'][i]):.4f}"
        )
    out = apply_augmentation_device(batch, _jax.random.PRNGKey(iteration), crop_h, crop_w)
    paths = []
    for name in ("img0", "img1"):
        w = Writer(folder, kind="img", prefix=f"aug{name[-1]}_")
        paths += w(np.asarray(out[name]), iteration)
    return paths


def make_augmented_loss(
    base_loss: Callable,
    crop_h: int,
    crop_w: int,
    seed: int = 0,
    *,
    mean_window: int = 0,
    mean_per_pixel: bool = False,
    spatial_method: Optional[str] = None,
    config: Optional[FlowNetAugConfig] = None,
) -> Callable:
    """Wrap a training objective so it applies device augmentation first.
    The noise key derives from a fingerprint of the host-sampled affines
    (deterministic per batch, varying per step).

    ``spatial_method``/``config``: the device spatial path. An explicit
    ``spatial_method`` wins; otherwise it is derived from ``config`` (the
    same :class:`FlowNetAugConfig` the coefficient sampler uses) via
    :func:`spatial_method_for` — in particular mirror-enabled configs are
    forced onto the exact gather path, matching the sampler's budget-
    rejection rules (ADVICE r4 #3).

    With ``mean_window > 0`` and a batch carrying MeanRecompute state, the
    per-frame augmented batch means are surfaced in the aux dict as
    ``aug_batch_mean0/1`` so the training loop can fold them into its
    host-side :class:`~flownet2_tpu.data.mean.MeanRecompute` mirrors."""

    if spatial_method is None:
        spatial_method = spatial_method_for(config or FlowNetAugConfig())
    base_key = jax.random.PRNGKey(seed)

    def loss_fn(params, batch):
        if "aug_mat0" in batch:
            # non-augmentation state rides through untouched (e.g. the
            # "frozen" upstream-params subtree of a split stage loss)
            passthrough = {"frozen": batch["frozen"]} if "frozen" in batch else {}
            fp = jnp.sum(batch["aug_mat0"]).astype(jnp.float32)
            key = jax.random.fold_in(base_key, jnp.abs(fp * 1e4).astype(jnp.int32))
            batch = apply_augmentation_device(
                batch, key, crop_h, crop_w,
                mean_window=mean_window, mean_per_pixel=mean_per_pixel,
                spatial_method=spatial_method,
            )
            batch.update(passthrough)
            extra = {
                k: batch.pop(k)
                for k in ("aug_batch_mean0", "aug_batch_mean1")
                if k in batch
            }
            loss, aux = base_loss(params, batch)
            if extra:
                aux = dict(aux, **extra)
            return loss, aux
        return base_loss(params, batch)

    return loss_fn
