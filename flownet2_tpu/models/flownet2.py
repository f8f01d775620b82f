"""The stacked FlowNet2 cascade: C → S1 → S2 (+ SD) → fusion.

Deploy-graph semantics (FlowNet 2.0, CVPR 2017; the reference ships this as
downloaded prototxt templates — models/download-models.sh — wired from
exactly the custom layer set in SURVEY.md §2.2):

1. normalize: subtract the per-sample/per-channel mean over BOTH frames
   (the deploy nets' recompute-mean path) and scale by 1/255;
2. FlowNetC on (img0, img1): predicts flow/20 at 1/4 res → ×20, bilinear
   upsample ×4 to full res;
3. warp img1 backward by the flow (FlowWarp), brightness error
   ChannelNorm(img0 - warped), stack
   [img0, img1, warped, flow/20, err] (12ch) → FlowNetS1 → same unstacking;
4. repeat for FlowNetS2 → css flow (large-displacement branch);
5. FlowNet2-SD on [img0, img1] → sd flow (small-displacement branch; its
   upsampled output is divided by 20 — the SD net predicts at full scale);
6. fusion net on [img0, sd_flow, css_flow, |sd_flow|, |css_flow|,
   |err_sd|, |err_css|] at full resolution → final flow.

The entire cascade is one jit-compiled XLA program; there is no graph
interpreter (reference Net::Init/ForwardFromTo, net.cpp:40-602, collapses
into this function under jax.jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flownet2_tpu.models.flownet_c import flownet_c_apply, flownet_c_init
from flownet2_tpu.models.flownet_s import flownet_s_apply, flownet_s_init
from flownet2_tpu.models.flownet_sd import flownet_sd_apply, flownet_sd_init
from flownet2_tpu.models.fusion import fusion_apply, fusion_init
from flownet2_tpu.ops.channel_norm import channel_norm
from flownet2_tpu.ops.resample import resample
from flownet2_tpu.ops.warp import flow_warp

DIV_FLOW = 20.0
RGB_MAX = 255.0


def normalize_images(img0: jnp.ndarray, img1: jnp.ndarray):
    """Per-sample per-channel mean (over both frames) subtraction + /255.

    Statistics accumulate in f32; outputs keep the input dtype so a bf16
    cascade stays bf16 end to end (the warp/correlation fast paths key off
    the activation dtype).
    """
    dtype = img0.dtype
    both = jnp.stack([img0, img1], axis=1).astype(jnp.float32)  # (N,2,H,W,3)
    mean = jnp.mean(both, axis=(1, 2, 3), keepdims=True)  # (N,1,1,1,3)
    both = ((both - mean) / RGB_MAX).astype(dtype)
    return both[:, 0], both[:, 1]


def _upsample_flow_4x(flow_quarter: jnp.ndarray, scale: float) -> jnp.ndarray:
    """×4 bilinear upsample of a 1/4-res flow, values scaled by ``scale``."""
    h, w = flow_quarter.shape[1] * 4, flow_quarter.shape[2] * 4
    return resample(flow_quarter * scale, h, w, method="linear", antialias=False)


def flownet2_init(key: jax.Array, dtype=jnp.float32) -> dict:
    kc, ks1, ks2, ksd, kf = jax.random.split(key, 5)
    return {
        "flownetc": flownet_c_init(kc, dtype=dtype),
        "flownets_1": flownet_s_init(ks1, in_channels=12, dtype=dtype),
        "flownets_2": flownet_s_init(ks2, in_channels=12, dtype=dtype),
        "flownetsd": flownet_sd_init(ksd, dtype=dtype),
        "fusion": fusion_init(kf, dtype=dtype),
    }


def _cascade_stage(params_s: dict, x0: jnp.ndarray, x1: jnp.ndarray, flow_full: jnp.ndarray):
    """One S-refinement stage: warp, error, stack, run FlowNetS."""
    warped = flow_warp(x1, flow_full)
    err = channel_norm(x0 - warped)
    stacked = jnp.concatenate([x0, x1, warped, flow_full / DIV_FLOW, err], axis=-1)
    flows = flownet_s_apply(params_s, stacked)
    return _upsample_flow_4x(flows["flow2"], DIV_FLOW), flows


def flownet2_cs_apply(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """FlowNet2-CS: C → S1. Returns full-res flow."""
    x0, x1 = normalize_images(img0, img1)
    flows_c = flownet_c_apply(params["flownetc"], x0, x1)
    flow_c = _upsample_flow_4x(flows_c["flow2"], DIV_FLOW)
    flow_s1, _ = _cascade_stage(params["flownets_1"], x0, x1, flow_c)
    return flow_s1


def flownet2_css_apply(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """FlowNet2-CSS: C → S1 → S2. Returns full-res flow."""
    x0, x1 = normalize_images(img0, img1)
    flows_c = flownet_c_apply(params["flownetc"], x0, x1)
    flow_c = _upsample_flow_4x(flows_c["flow2"], DIV_FLOW)
    flow_s1, _ = _cascade_stage(params["flownets_1"], x0, x1, flow_c)
    flow_s2, _ = _cascade_stage(params["flownets_2"], x0, x1, flow_s1)
    return flow_s2


def build_fusion_inputs(params: dict, x0: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """Everything upstream of the fusion net, on NORMALIZED frames: the CSS
    branch (C → S1 → S2), the SD branch, and the fusion feature stack
    [x0, sd_flow, css_flow, |sd|, |css|, |err_sd|, |err_css|] (11ch).

    Shared by :func:`flownet2_apply` and the fusion-stage training objective
    (train/objectives.make_fusion_stage_loss, which freezes this whole
    prefix — the stage-wise recipe)."""
    # Large-displacement branch: C → S1 → S2.
    flows_c = flownet_c_apply(params["flownetc"], x0, x1)
    flow_c = _upsample_flow_4x(flows_c["flow2"], DIV_FLOW)
    flow_s1, _ = _cascade_stage(params["flownets_1"], x0, x1, flow_c)
    flow_s2, _ = _cascade_stage(params["flownets_2"], x0, x1, flow_s1)
    css_flow = flow_s2

    # Small-displacement branch. The SD net's raw quarter-res output is at
    # 20× real scale (its training normalization), so the deploy graph
    # DIVIDES by div_flow here where the CSS branch multiplies.
    flows_sd = flownet_sd_apply(params["flownetsd"], jnp.concatenate([x0, x1], axis=-1))
    sd_flow = _upsample_flow_4x(flows_sd["flow2"], 1.0 / DIV_FLOW)

    # Fusion inputs: flows, their magnitudes, and both brightness errors.
    # (Batching the two independent warps into one 2B call was measured
    # SLOWER — 252.6 vs 257.6 pairs/s @448x320 b8, 62.4 vs 66.9 @Sintel b8 —
    # the [x1;x1]/[sd;css] concats and output slices cost more than the
    # second kernel launch. DESIGN_NOTES negative-results ledger, round 5.)
    norm_sd = channel_norm(sd_flow)
    norm_css = channel_norm(css_flow)
    warped_sd = flow_warp(x1, sd_flow)
    warped_css = flow_warp(x1, css_flow)
    err_sd = channel_norm(x0 - warped_sd)
    err_css = channel_norm(x0 - warped_css)

    return jnp.concatenate(
        [x0, sd_flow, css_flow, norm_sd, norm_css, err_sd, err_css], axis=-1
    )


def flownet2_apply(params: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Full FlowNet2: CSS + SD fused. img*: (N, H, W, 3) raw 0-255 RGB;
    returns (N, H, W, 2) flow at input resolution (H, W divisible by 64)."""
    x0, x1 = normalize_images(img0, img1)
    fused_in = build_fusion_inputs(params, x0, x1)
    flows_fused = fusion_apply(params["fusion"], fused_in)
    return flows_fused["flow0"]
