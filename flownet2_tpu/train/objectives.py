"""Training objectives: model forward + multi-scale EPE supervision.

Wires the pieces the reference training prototxts wire as layers
(SURVEY.md §3.2): normalize → net → per-scale NaN-aware GT downsample →
weighted L1/EPE losses. GT flow is scaled by 1/DIV_FLOW before
downsampling (the nets predict flow/20 — the training nets' Eltwise
coeff 0.05 on the GT path).
"""

from __future__ import annotations

from typing import Callable

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
    img0 = batch["img0"].astype(jnp.float32)
    img1 = batch["img1"].astype(jnp.float32)
    flow = batch["flow"].astype(jnp.float32)
    return img0, img1, flow


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


LOSSES: dict[str, Callable] = {
    "flownets": flownet_s_loss,
    "flownetc": flownet_c_loss,
    "flownet2-sd": flownet_sd_loss,
}
