"""End-to-end inference: the ``run-flownet.py`` contract as jitted programs.

Pipeline per the reference driver + deploy templates (scripts/run-flownet.py:
37-60, SURVEY.md §3.1): resize the image pair to the /64-adapted resolution,
run the net, upsample the predicted flow back to the target resolution and
rescale u/v by target/adapted per axis. The reference implements this with
prototxt text templating; here each (model, adapted-geometry) pair is one
jit-compiled XLA program, cached and reused while the resolution is stable
(the run-flownet-many.py:50-75 behavior).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from flownet2_tpu.core.adapt import AdaptedGeometry, adapt_shape
from flownet2_tpu.models import (
    DIV_FLOW,
    dispnet_c_apply,
    dispnet_c_init,
    flownet2_apply,
    flownet2_css_apply,
    flownet2_cs_apply,
    flownet2_init,
    flownet_c_apply,
    flownet_c_init,
    flownet_s_apply,
    flownet_s_init,
    flownet_sd_apply,
    flownet_sd_init,
    normalize_images,
)
from flownet2_tpu.ops.resample import resample


def _s_quarter(params, x0, x1):
    flows = flownet_s_apply(params, jnp.concatenate([x0, x1], axis=-1))
    return flows["flow2"], DIV_FLOW


def _c_quarter(params, x0, x1):
    flows = flownet_c_apply(params, x0, x1)
    return flows["flow2"], DIV_FLOW


def _sd_quarter(params, x0, x1):
    flows = flownet_sd_apply(params, jnp.concatenate([x0, x1], axis=-1))
    return flows["flow2"], 1.0 / DIV_FLOW


def _dispc_quarter(params, x0, x1):
    preds = dispnet_c_apply(params, x0, x1)
    return preds["flow2"], DIV_FLOW


def _make_forward(model: str) -> Callable:
    """forward(params, img0, img1) -> adapted-resolution flow (real scale).

    img0/img1: (N, Ha, Wa, 3) float32, raw 0-255 range, already adapted size.
    """
    if model in ("flownet2", "flownet2-css", "flownet2-cs"):
        fn = {
            "flownet2": flownet2_apply,
            "flownet2-css": flownet2_css_apply,
            "flownet2-cs": flownet2_cs_apply,
        }[model]
        return fn

    quarter = {
        "flownets": _s_quarter,
        "flownetc": _c_quarter,
        "flownet2-sd": _sd_quarter,
        "dispnetc": _dispc_quarter,
    }[model]

    def forward(params, img0, img1):
        x0, x1 = normalize_images(img0, img1)
        flow_q, post_scale = quarter(params, x0, x1)
        h, w = img0.shape[1], img0.shape[2]
        return resample(flow_q * post_scale, h, w, method="linear", antialias=False)

    return forward


MODEL_INITS = {
    "flownets": lambda key: flownet_s_init(key),
    "flownetc": lambda key: flownet_c_init(key),
    "flownet2-sd": lambda key: flownet_sd_init(key),
    "flownet2-cs": lambda key: flownet2_init(key),
    "flownet2-css": lambda key: flownet2_init(key),
    "flownet2": lambda key: flownet2_init(key),
    "dispnetc": lambda key: dispnet_c_init(key),
}

MODEL_NAMES = tuple(MODEL_INITS)


class FlowRunner:
    """Resolution-aware cached inference engine for one model.

    ``dtype``: optional compute dtype for weights/activations ("bfloat16"
    engages the MXU fast paths). Measured on the trained staged-cascade
    checkpoint (full FlowNet2, 448x320): bf16 costs +0.021 px GT-EPE
    (0.508 -> 0.529), mean bf16-vs-f32 flow divergence 0.079 px, max 2.3 px
    (docs/DESIGN_NOTES.md "bf16 inference parity"). Divergence under RANDOM
    weights is large/chaotic and is not evidence. Flow I/O stays float32
    either way.

    ``warp_method``: force every internal FlowWarp (the cascade's
    warped-image inputs, models/flownet2.py) onto one
    :func:`~flownet2_tpu.ops.warp.flow_warp` method. ``"gather"`` makes the
    runner exact-by-construction w.r.t. the reference's warp
    (flow_warp_layer.cpp:58-117) — the evaluation default in ``cli/test.py``
    and ``cli/eval_parity.py`` — where the default fast path clamps large
    per-tile flow variation (measured 1.5% of pixels on Sintel-statistics
    flows, DESIGN_NOTES "Windowed-warp clamp"). ``None`` keeps the
    throughput-first auto routing.
    """

    def __init__(self, model: str, params: dict, dtype=None, warp_method=None):
        if model not in MODEL_INITS:
            raise ValueError(f"unknown model {model!r}; choose from {MODEL_NAMES}")
        self.model = model
        self.warp_method = warp_method
        if dtype is not None:
            dtype = jnp.dtype(dtype)
            params = jax.tree.map(lambda x: x.astype(dtype), params)
        self.dtype = dtype
        self.params = params
        self._forward = _make_forward(model)
        self._jitted: dict = {}

    def _program(self, geom: AdaptedGeometry):
        key = (geom.adapted_height, geom.adapted_width, geom.target_height, geom.target_width)
        if key not in self._jitted:

            dtype = self.dtype

            @jax.jit
            def program(params, img0, img1):
                # Adapt input resolution (deploy's leading Resample layers).
                ah, aw = geom.adapted_height, geom.adapted_width
                img0a = resample(img0, ah, aw, method="linear")
                img1a = resample(img1, ah, aw, method="linear")
                if dtype is not None:
                    img0a = img0a.astype(dtype)
                    img1a = img1a.astype(dtype)
                flow = self._forward(params, img0a, img1a)
                # Back to target size with per-axis flow rescale
                # (deploy's trailing Resample × $SCALE_*$ Eltwise).
                th, tw = geom.target_height, geom.target_width
                flow = resample(flow.astype(jnp.float32), th, tw, method="linear", antialias=False)
                scale = jnp.asarray([geom.scale_width, geom.scale_height], jnp.float32)
                return flow * scale

            self._jitted[key] = program
        return self._jitted[key]

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        """img0/img1: (H, W, 3) uint8/float RGB → (H, W, 2) float32 flow."""
        if img0.shape != img1.shape:
            raise ValueError(f"image shapes differ: {img0.shape} vs {img1.shape}")
        h, w = img0.shape[:2]
        geom = adapt_shape(h, w)
        program = self._program(geom)
        i0 = jnp.asarray(img0, jnp.float32)[None]
        i1 = jnp.asarray(img1, jnp.float32)[None]
        flow = self._run(program, i0, i1)
        return np.asarray(flow[0])

    def batch(self, img0: np.ndarray, img1: np.ndarray) -> np.ndarray:
        """Batched variant: (N, H, W, 3) → (N, H, W, 2)."""
        h, w = img0.shape[1:3]
        geom = adapt_shape(h, w)
        program = self._program(geom)
        flow = self._run(
            program, jnp.asarray(img0, jnp.float32), jnp.asarray(img1, jnp.float32)
        )
        return np.asarray(flow)

    def _run(self, program, i0, i1):
        # warp_method must be in force while jit TRACES (first invocation);
        # holding it on every call is free after that.
        if self.warp_method is None:
            return program(self.params, i0, i1)
        from flownet2_tpu.ops.warp import force_warp_method

        with force_warp_method(self.warp_method):
            return program(self.params, i0, i1)
