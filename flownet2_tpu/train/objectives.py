"""Training objectives: model forward + multi-scale EPE supervision.

Wires the pieces the reference training prototxts wire as layers
(SURVEY.md §3.2): normalize → net → per-scale NaN-aware GT downsample →
weighted L1/EPE losses. GT flow is scaled by 1/DIV_FLOW before
downsampling (the nets predict flow/20 — the training nets' Eltwise
coeff 0.05 on the GT path).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from flownet2_tpu.models import (
    DIV_FLOW,
    flownet_c_apply,
    flownet_s_apply,
    flownet_sd_apply,
    normalize_images,
)
from flownet2_tpu.ops.losses import multiscale_l1_loss


def _batch_views(batch: dict):
    # Images keep their floating dtype (a bf16 batch trains the bf16 fast
    # paths; see with_compute_dtype); integer-coded batches upcast to f32.
    # Flow targets are always f32 — every loss accumulates in f32. Batches
    # may arrive in the TRANSPORT domain (uint8 images, int16 fixed-point
    # flow — half/quarter the upload bytes); the decode runs here, on
    # device (core/codec.flow_as_f32_device).
    from flownet2_tpu.core.codec import flow_as_f32_device

    def as_float(x):
        return x if jnp.issubdtype(x.dtype, jnp.floating) else x.astype(jnp.float32)

    return as_float(batch["img0"]), as_float(batch["img1"]), flow_as_f32_device(batch["flow"])


def with_compute_dtype(loss_fn, dtype):
    """Mixed-precision wrapper: run the network in ``dtype`` (e.g. bf16 —
    activations AND a cast copy of the weights) while the optimizer keeps
    f32 master params; gradients return in f32 via the cast's transpose.
    ``dtype=None`` is the identity."""
    if dtype is None:
        return loss_fn
    dtype = jnp.dtype(dtype)

    def cast(x):
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    def wrapped(params, batch):
        p = jax.tree.map(cast, params)
        b = dict(batch)
        for k in ("img0", "img1"):
            if k in b:
                b[k] = cast(b[k])
        if "frozen" in b:  # split stage losses: upstream nets run in dtype too
            b["frozen"] = jax.tree.map(cast, b["frozen"])
        return loss_fn(p, b)

    return wrapped


def flownet_s_loss(params: dict, batch: dict) -> tuple[jnp.ndarray, dict]:
    """batch: img0/img1 (N,H,W,3) raw 0-255, flow (N,H,W,2) real scale."""
    img0, img1, flow = _batch_views(batch)
    x0, x1 = normalize_images(img0, img1)
    flows = flownet_s_apply(params, jnp.concatenate([x0, x1], axis=-1))
    total, per_scale = multiscale_l1_loss(flows, flow / DIV_FLOW)
    return total, {"loss": total, **per_scale}


def flownet_c_loss(params: dict, batch: dict) -> tuple[jnp.ndarray, dict]:
    img0, img1, flow = _batch_views(batch)
    x0, x1 = normalize_images(img0, img1)
    flows = flownet_c_apply(params, x0, x1)
    total, per_scale = multiscale_l1_loss(flows, flow / DIV_FLOW)
    return total, {"loss": total, **per_scale}


def flownet_sd_loss(params: dict, batch: dict) -> tuple[jnp.ndarray, dict]:
    img0, img1, flow = _batch_views(batch)
    x0, x1 = normalize_images(img0, img1)
    flows = flownet_sd_apply(params, jnp.concatenate([x0, x1], axis=-1))
    # The SD net predicts at 20× real scale (models/flownet2.py), so its
    # training target is flow*DIV_FLOW/... — i.e. raw flow matched at
    # quarter-res ×20/20: target = flow (net-output units = 20×(flow/20)).
    total, per_scale = multiscale_l1_loss(flows, flow)
    return total, {"loss": total, **per_scale}


def flownet_sd_chairssdhom_loss(
    params: dict, batch: dict, episode: tuple[float, float] = (2.0, 0.5)
) -> tuple[jnp.ndarray, dict]:
    """The ChairsSDHom small-displacement recipe: BlackAugmentation on the
    batch (whole-pair blackout / border zeroing, black_augmentation_layer.cu)
    + per-scale Lpq losses with the scheduled (p, q) episode (SURVEY.md §2.2).

    batch may carry ``black_mask``/``border_frac`` (N,) arrays sampled by the
    host loader; absent, no blackening is applied.
    """
    from flownet2_tpu.ops.augment import apply_black_augmentation
    from flownet2_tpu.ops.downsample import downsample_nan_aware
    from flownet2_tpu.ops.losses import lpq_loss

    img0, img1, flow = _batch_views(batch)
    if "black_mask" in batch:
        stackimg = jnp.concatenate([img0, img1], axis=-1)
        stackimg, flow = apply_black_augmentation(
            stackimg, flow, batch["black_mask"], batch["border_frac"]
        )
        img0, img1 = stackimg[..., :3], stackimg[..., 3:]
    x0, x1 = normalize_images(img0, img1)
    flows = flownet_sd_apply(params, jnp.concatenate([x0, x1], axis=-1))

    p, q = episode
    total = jnp.asarray(0.0, jnp.float32)
    per_scale = {}
    weights = {"flow6": 0.32, "flow5": 0.08, "flow4": 0.02, "flow3": 0.01, "flow2": 0.005}
    for name, f in flows.items():
        w = weights.get(name, 0.0)
        if w == 0.0:
            continue
        gt = downsample_nan_aware(flow, f.shape[1], f.shape[2])
        loss = lpq_loss(f, gt, p=p, q=q)
        per_scale[name] = loss
        total = total + w * loss
    return total, {"loss": total, **per_scale}


def dispnet_c_loss(params: dict, batch: dict) -> tuple[jnp.ndarray, dict]:
    """Stereo objective: multi-scale L1 on 1-channel disparity
    (batch: img0=left, img1=right, flow=(N,H,W,1) disparity; the
    DisparityData convention, disparity_data_layer.cpp:29). Targets are
    normalized by DIV_FLOW like the flow nets."""
    from flownet2_tpu.models.dispnet import dispnet_c_apply

    img0, img1, disp = _batch_views(batch)
    x0, x1 = normalize_images(img0, img1)
    preds = dispnet_c_apply(params, x0, x1)
    total, per_scale = multiscale_l1_loss(preds, disp / DIV_FLOW)
    return total, {"loss": total, **per_scale}


def flownet2_loss(params: dict, batch: dict) -> tuple[jnp.ndarray, dict]:
    """Joint objective on the FULL cascade: EPE of the fused final flow.

    The reference trains the stacked nets stage-wise (see
    :func:`make_cascade_stage_loss`); this joint loss exists for end-to-end
    finetuning and for validating the whole cascade — warp, correlation,
    SD branch, fusion — under one sharded train step (the multichip dryrun).
    """
    from flownet2_tpu.models import flownet2_apply
    from flownet2_tpu.ops.losses import l1_loss

    img0, img1, flow = _batch_views(batch)
    pred = flownet2_apply(params, img0, img1)
    loss = l1_loss(pred, flow, l2_per_location=True)
    return loss, {"loss": loss}


def make_cascade_stage_loss(stage: str) -> Callable:
    """Training objective for a cascade refinement stage (S1/S2) with the
    upstream nets frozen — the FlowNet2 stage-wise training recipe (paper §4;
    the reference trains each stacked net with earlier weights fixed).

    ``params`` must be the full cascade pytree; gradients flow only into
    ``params[stage]`` (stop_gradient on the upstream flow).
    """
    from flownet2_tpu.models.flownet2 import DIV_FLOW, _cascade_stage
    from flownet2_tpu.models.flownet_c import flownet_c_apply
    from flownet2_tpu.models.flownet2 import _upsample_flow_4x

    if stage not in ("flownets_1", "flownets_2"):
        raise ValueError(f"unknown cascade stage {stage!r}")

    def loss_fn(params, batch):
        img0, img1, flow = _batch_views(batch)
        x0, x1 = normalize_images(img0, img1)
        stop = jax.lax.stop_gradient
        flows_c = flownet_c_apply(stop(params["flownetc"]), x0, x1)
        upstream = _upsample_flow_4x(flows_c["flow2"], DIV_FLOW)
        if stage == "flownets_2":
            f1, _ = _cascade_stage(stop(params["flownets_1"]), x0, x1, upstream)
            upstream = f1
        upstream = stop(upstream)
        _, flows = _cascade_stage(params[stage], x0, x1, upstream)
        total, per_scale = multiscale_l1_loss(flows, flow / DIV_FLOW)
        return total, {"loss": total, **per_scale}

    return loss_fn


def make_sd_stage_loss() -> Callable:
    """The SD branch trained inside the full-cascade pytree (gradients into
    ``params["flownetsd"]`` only) — lets the staged recipe share one
    checkpoint structure across stages."""

    def loss_fn(params, batch):
        return flownet_sd_loss(params["flownetsd"], batch)

    return loss_fn


def make_c_stage_loss() -> Callable:
    """FlowNetC trained inside the full-cascade pytree."""

    def loss_fn(params, batch):
        return flownet_c_loss(params["flownetc"], batch)

    return loss_fn


def make_fusion_stage_loss(
    weights: dict[str, float] | None = None,
) -> Callable:
    """Fusion-net training with the entire upstream cascade frozen — the
    final step of the stage-wise FlowNet2 recipe (paper §4: CSS and SD are
    trained first, then the fusion net learns to merge them).

    The fusion net predicts REAL-scale flow at strides 1/2/4 ("flow0" is
    the final output, models/fusion.py), so targets are the raw GT flow
    downsampled per scale with no DIV_FLOW normalization. The per-scale
    weights approximate the released recipe (the training prototxts are
    downloaded assets, models/download-models.sh — same offline limit as
    data/augment_pipeline.py's distributions).

    Each scale normalizes by its valid-pixel count (``normalize_by_num_
    entries``, l1loss_layer.cu:86-91): the fusion heads supervise stride
    1/2/4 — per-image pixel SUMS there are ~1e4× the coarse-grid sums every
    other stage trains on (VERDICT r3 weak.3: fusion loss ~2e5 while all
    other stages run O(1-25)), which distorts any LR schedule shared across
    stages. Normalized, the loss is a weighted mean EPE — O(1-25) like its
    siblings. The default weights fold each scale's pixel share into the
    coefficient (1, 0.5/4, 0.25/16 per-pixel ⇒ 1 : 0.125 : 0.015625) so
    the gradient DIRECTION is identical to the pixel-sum convention — only
    the reported magnitude changes (verified: staged cascade retrains to
    the same 0.51 EPE, runs/cascade)."""
    from flownet2_tpu.models.flownet2 import build_fusion_inputs
    from flownet2_tpu.models.fusion import fusion_apply

    weights = weights or {"flow0": 1.0, "flow1": 0.125, "flow2": 0.015625}

    def loss_fn(params, batch):
        img0, img1, flow = _batch_views(batch)
        x0, x1 = normalize_images(img0, img1)
        stop = jax.lax.stop_gradient
        fused_in = stop(build_fusion_inputs(params, x0, x1))
        flows = fusion_apply(params["fusion"], fused_in)
        total, per_scale = multiscale_l1_loss(flows, flow, weights, normalize=True)
        return total, {"loss": total, **per_scale}

    return loss_fn


# Cascade stage -> params subtree it trains (the stage-wise recipe order).
STAGE_SUBTREE = {
    "c": "flownetc",
    "s1": "flownets_1",
    "s2": "flownets_2",
    "sd": "flownetsd",
    "fusion": "fusion",
}

# Full-pytree loss key per stage (gradients land in the subtree; upstream
# frozen via stop_gradient inside each loss).
STAGE_LOSS_KEY = {
    "c": "flownet2-c-stage",
    "s1": "flownet2-s1",
    "s2": "flownet2-s2",
    "sd": "flownet2-sd-stage",
    "fusion": "flownet2-fusion",
}


# Frozen upstream subtrees each stage's loss actually READS (its dataflow
# dependencies). Shipping only these as the replicated "frozen" batch input
# matters: replicating dead subtrees costs real host->device bytes per
# device (e.g. s1 needs flownetc's 39M params, not the other ~120M).
STAGE_FROZEN_DEPS = {
    "c": (),
    "s1": ("flownetc",),
    "s2": ("flownetc", "flownets_1"),
    "sd": (),
    "fusion": ("flownetc", "flownets_1", "flownets_2", "flownetsd"),
}


def split_stage_params(params: dict, stage: str) -> tuple[dict, dict]:
    """Split a full-cascade pytree into (trainable subtree, frozen deps)
    for one stage of the stage-wise recipe. The frozen dict carries ONLY
    the subtrees the stage's loss reads (STAGE_FROZEN_DEPS)."""
    sub = STAGE_SUBTREE[stage]
    return params[sub], {k: params[k] for k in STAGE_FROZEN_DEPS[stage]}


def make_split_stage_loss(stage: str) -> Callable:
    """Stage objective over ONLY the trainable subtree: ``loss_fn(
    stage_params, batch)`` where ``batch["frozen"]`` carries the frozen
    upstream subtrees as (replicated) inputs.

    This is the train-step-sized formulation: the optimizer, gradient
    ravel, and the fused DP psum (parallel.data_parallel.make_dp_train_step)
    see a stage-sized pytree instead of the full ~160M-param cascade —
    compile time and collective payload shrink by the cascade/stage ratio.
    The math is identical to the full-pytree variant (STAGE_LOSS_KEY):
    frozen params enter as data, exactly like the reference's lr_mult=0
    blobs which still live in GPU memory but receive no update
    (solver.cpp:194-324).
    """
    base = LOSSES[STAGE_LOSS_KEY[stage]]
    sub = STAGE_SUBTREE[stage]

    def loss_fn(stage_params, batch):
        batch = dict(batch)
        frozen = batch.pop("frozen")
        full = dict(frozen)
        full[sub] = stage_params
        return base(full, batch)

    return loss_fn


LOSSES: dict[str, Callable] = {
    "flownets": flownet_s_loss,
    "flownetc": flownet_c_loss,
    "dispnetc": dispnet_c_loss,
    "flownet2-sd": flownet_sd_loss,
    "flownet2-sd-sdhom": flownet_sd_chairssdhom_loss,
    "flownet2-s1": make_cascade_stage_loss("flownets_1"),
    "flownet2-s2": make_cascade_stage_loss("flownets_2"),
    "flownet2-fusion": make_fusion_stage_loss(),
    # cascade-pytree variants of the self-contained stages (same math as
    # flownetc / flownet2-sd; gradients land in the named subtree)
    "flownet2-c-stage": make_c_stage_loss(),
    "flownet2-sd-stage": make_sd_stage_loss(),
}
