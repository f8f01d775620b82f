"""Robust flow losses: L1/EPE (``L1Loss``) and generalized Lpq (``LpqLoss``).

Reference semantics (src/caffe/layers/l1loss_layer.{cpp,cu},
lpq_loss_layer.{cpp,cu}, params caffe.proto:563-625):

L1Loss, ``l2_per_location`` (the FlowNet EPE loss):
  diff   = pred - gt
  mask   = isfinite(diff)                    (FindNotNaNs, l1loss_layer.cu:20)
  diff   = diff * mask                       (KillMasked, :34)
  s      = Σ_c diff²  (×1/C if l2_prescale_by_channels — the 1×1 const conv,
                       l1loss_layer.cpp:41-54)
  if plateau > 0: s = s * (s >= plateau²)    (MaskPlateauValuesInitial, cu:60)
  epe    = (s + epsilon)^0.5                 (sqrt Power layer, cpp:56-62)
  loss   = Σ epe / normalize_coeff
  normalize_coeff = batch (or #non-NaN/C when normalize_by_num_entries,
                    l1loss_layer.cu:86-91)

L1Loss, plain:
  mask  &= |diff| >= plateau                 (MaskPlateauValues, cu:52-56)
  loss   = Σ |diff * mask| / normalize_coeff

LpqLoss:
  a      = |diff * mask|
  s      = Σ_c (a + p_eps)^p   (×1/C opt)
  loss   = Σ (s + q_eps)^q / normalize_coeff
  with (p, q) following an iteration-indexed episode schedule
  (lpq_loss_layer.cpp:19-80).

Backward in the reference chains through the same masks; JAX autodiff of
these expressions (masks stop-gradiented) reproduces it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp


def _nan_mask_and_norm(diff: jnp.ndarray, normalize_by_num_entries: bool):
    mask = jnp.isfinite(diff)
    if normalize_by_num_entries:
        channels = diff.shape[-1]
        norm = jnp.sum(mask.astype(jnp.float32)) / channels
        norm = jnp.maximum(norm, 1.0)
    else:
        norm = jnp.asarray(float(diff.shape[0]), jnp.float32)
    return jax.lax.stop_gradient(mask), norm


def l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray | None = None,
    *,
    l2_per_location: bool = False,
    l2_prescale_by_channels: bool = False,
    normalize_by_num_entries: bool = False,
    epsilon: float = 1e-2,
    plateau: float = 0.0,
) -> jnp.ndarray:
    """Scalar L1/EPE loss over NHWC inputs (target optional, as in the
    reference's 1-bottom mode)."""
    diff = pred if target is None else pred - target
    diff = diff.astype(jnp.float32)
    mask, norm = _nan_mask_and_norm(diff, normalize_by_num_entries)

    if l2_per_location:
        diff = jnp.where(mask, diff, 0.0)
        scale = 1.0 / diff.shape[-1] if l2_prescale_by_channels else 1.0
        s = jnp.sum(jnp.square(diff), axis=-1, keepdims=True) * scale
        if plateau > 0:
            keep = jax.lax.stop_gradient(s >= plateau * plateau)
            s = jnp.where(keep, s, 0.0)
        epe = jnp.sqrt(s + epsilon)
        return jnp.sum(epe) / norm
    else:
        if plateau > 0:
            mask = mask & jax.lax.stop_gradient(jnp.abs(diff) >= plateau)
        diff = jnp.where(mask, diff, 0.0)
        return jnp.sum(jnp.abs(diff)) / norm


def epe(pred_flow: jnp.ndarray, gt_flow: jnp.ndarray) -> jnp.ndarray:
    """Plain average endpoint error metric (NaN GT pixels excluded)."""
    d = pred_flow.astype(jnp.float32) - gt_flow.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(jnp.square(d), axis=-1))
    valid = jnp.isfinite(dist)
    dist = jnp.where(valid, dist, 0.0)
    return jnp.sum(dist) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


@dataclass(frozen=True)
class LpqSchedule:
    """Iteration-indexed (p, q) episode schedule (lpq_loss_layer.cpp:19-80)."""

    start_iters: Sequence[int] = (0,)
    ps: Sequence[float] = (2.0,)
    qs: Sequence[float] = (0.5,)

    def __post_init__(self):
        if not (len(self.start_iters) == len(self.ps) == len(self.qs)):
            raise ValueError("schedule arrays must have equal length")
        if len(self.start_iters) == 0:
            raise ValueError("schedule must not be empty")
        if self.start_iters[0] != 0:
            raise ValueError("first episode must start at iteration 0")
        if any(a >= b for a, b in zip(self.start_iters, self.start_iters[1:])):
            raise ValueError("episode start iterations must be strictly increasing")

    def at(self, iteration: int) -> tuple[float, float]:
        idx = 0
        for i, start in enumerate(self.start_iters):
            if iteration >= start:
                idx = i
        return self.ps[idx], self.qs[idx]


def lpq_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray | None = None,
    *,
    p: float = 2.0,
    q: float = 0.5,
    p_epsilon: float = 0.0,
    q_epsilon: float = 1e-2,
    l2_prescale_by_channels: bool = False,
    normalize_by_num_entries: bool = False,
) -> jnp.ndarray:
    """Scalar Lpq loss: (Σ_c (|diff|+pe)^p + qe)^q summed and normalized.

    p and q are plain Python floats here; the per-iteration curriculum is
    applied by the solver via :class:`LpqSchedule` (changing p/q re-traces,
    once per episode — episodes are few).
    """
    diff = pred if target is None else pred - target
    diff = diff.astype(jnp.float32)
    mask, norm = _nan_mask_and_norm(diff, normalize_by_num_entries)
    a = jnp.abs(jnp.where(mask, diff, 0.0))
    scale = 1.0 / diff.shape[-1] if l2_prescale_by_channels else 1.0
    s = jnp.sum((a + p_epsilon) ** p, axis=-1, keepdims=True) * scale
    return jnp.sum((s + q_epsilon) ** q) / norm


# The FlowNet per-scale supervision weights (train prototxt convention:
# loss_weight on l1 losses at predict_flow{6..2}; external knowledge from the
# released FlowNet2 training templates — weights ramp toward finer scales).
DEFAULT_SCALE_WEIGHTS = {
    "flow6": 0.32,
    "flow5": 0.08,
    "flow4": 0.02,
    "flow3": 0.01,
    "flow2": 0.005,
}


def multiscale_l1_loss(
    flows: dict[str, jnp.ndarray],
    gt_flow: jnp.ndarray,
    weights: dict[str, float] | None = None,
    *,
    l2_per_location: bool = True,
    downsample_gt: bool = True,
    normalize: bool = False,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Weighted sum of per-scale EPE losses.

    ``flows`` maps scale names to (N, h, w, 2) predictions; ground truth is
    downsampled to each prediction's resolution with the NaN-aware area
    downsample, exactly as the reference training nets wire Downsample →
    L1Loss per scale (SURVEY.md §3.2).

    ``normalize`` forwards ``normalize_by_num_entries`` (l1loss_layer.cu:
    86-91) to every scale: each term becomes mean-EPE-per-pixel instead of
    a per-image pixel sum. Needed when the supervised scales span very
    different resolutions (the fusion net's stride-1/2/4 heads: an
    unnormalized full-res sum is ~16× the stride-4 term and ~1e4× the
    coarse-grid sums of the other stages, distorting any shared schedule).
    """
    from flownet2_tpu.ops.downsample import downsample_nan_aware

    weights = DEFAULT_SCALE_WEIGHTS if weights is None else weights
    total = jnp.asarray(0.0, jnp.float32)
    per_scale = {}
    for name, flow in flows.items():
        w = weights.get(name, 0.0)
        if w == 0.0:
            continue
        gt = gt_flow
        if downsample_gt and gt_flow.shape[1:3] != flow.shape[1:3]:
            gt = downsample_nan_aware(gt_flow, flow.shape[1], flow.shape[2])
        loss = l1_loss(
            flow, gt, l2_per_location=l2_per_location,
            normalize_by_num_entries=normalize,
        )
        per_scale[name] = loss
        total = total + w * loss
    return total, per_scale
