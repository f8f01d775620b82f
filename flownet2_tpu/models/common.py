"""Shared building blocks for the FlowNet encoders/decoders."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from flownet2_tpu.ops.activations import leaky_relu
from flownet2_tpu.ops.conv import conv2d, deconv2d_ps, init_conv_params
from flownet2_tpu.parallel.annotate import constrain_act


def conv_block(params: dict, name: str, x: jnp.ndarray, *, stride: int = 1, relu: bool = True) -> jnp.ndarray:
    p = params[name]
    k = p["w"].shape[0]
    out = conv2d(x, p["w"], p["b"], stride=stride, padding=k // 2)
    out = leaky_relu(out) if relu else out
    return constrain_act(out)


def use_s2d_head(x: jnp.ndarray, layout: str = "auto") -> bool:
    """Whether a full-resolution encoder head should run in the
    space-to-depth domain (ops/s2d.py): on accelerators with even H, W.
    Full-res convs below the 128-lane channel tile are the slowest ops in
    the cascade under XLA's native lowering (docs/DESIGN_NOTES.md)."""
    if layout == "auto":
        return (
            jax.default_backend() != "cpu"
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
    return layout == "s2d"


def strided_head_block(params: dict, name: str, x: jnp.ndarray, *, layout: str = "auto") -> jnp.ndarray:
    """First stride-2 encoder conv evaluated as one s2d-domain conv when
    possible (exact rewrite; tested against the plain path), else plain."""
    if use_s2d_head(x, layout):
        from flownet2_tpu.ops.s2d import conv2d_s2d, space_to_depth

        p = params[name]
        out = leaky_relu(conv2d_s2d(space_to_depth(x), p["w"], p["b"], stride=2))
        return constrain_act(out)
    return conv_block(params, name, x, stride=2)


def deconv_block(params: dict, name: str, x: jnp.ndarray, *, relu: bool = True) -> jnp.ndarray:
    p = params[name]
    # deconv2d_ps: the pixel-shuffle formulation of the k4/s2/p1 transposed
    # conv (exact; one dense MXU conv instead of XLA's input-dilated
    # lowering that wastes 4x on zero taps). Non-FlowNet geometries fall
    # back to the true deconv inside deconv2d_ps.
    out = deconv2d_ps(x, p["w"], p["b"], stride=2, padding=1)
    out = leaky_relu(out) if relu else out
    return constrain_act(out)


class ParamInit:
    """Accumulates layer params from one host-side numpy RNG.

    Seeded from a jax PRNG key for API uniformity, but sampling happens in
    numpy: device-side per-layer init compiled ~1 XLA program per layer and
    dominated model construction time on CPU.
    """

    def __init__(self, key: jax.Array, dtype=jnp.float32):
        import numpy as np

        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        self.rng = np.random.default_rng(seed)
        self.dtype = dtype
        self.params: dict = {}

    def conv(self, name: str, kernel: int, cin: int, cout: int):
        self.params[name] = init_conv_params(self.rng, kernel, cin, cout, dtype=self.dtype)

    def deconv(self, name: str, kernel: int, cin: int, cout: int):
        self.params[name] = init_conv_params(
            self.rng, kernel, cin, cout, deconv=True, dtype=self.dtype
        )


def refinement_decoder(
    params: dict,
    features: dict[int, jnp.ndarray],
    *,
    levels: tuple[int, ...] = (6, 5, 4, 3, 2),
    deconv_channels: dict[int, int] | None = None,
) -> dict[str, jnp.ndarray]:
    """The classic FlowNetS/C refinement decoder.

    ``features[l]`` is the encoder activation at level l (stride 2**l).
    Per level: predict flow, deconv features, deconv-upsample the flow,
    concat with the skip feature, repeat. Returns {"flow6".."flow2"} in
    net units (flow/20).
    """
    flows: dict[str, jnp.ndarray] = {}
    top = levels[0]
    flow = conv_block(params, f"predict_flow{top}", features[top], relu=False)
    flows[f"flow{top}"] = flow
    link = features[top]
    for lvl in levels[1:]:
        up_feat = deconv_block(params, f"deconv{lvl}", link)
        up_flow = deconv_block(params, f"upsample_flow{lvl + 1}to{lvl}", flow, relu=False)
        link = jnp.concatenate([features[lvl], up_feat, up_flow], axis=-1)
        flow = conv_block(params, f"predict_flow{lvl}", link, relu=False)
        flows[f"flow{lvl}"] = flow
    return flows


def init_refinement_decoder(
    pi: ParamInit,
    feature_channels: dict[int, int],
    *,
    levels: tuple[int, ...] = (6, 5, 4, 3, 2),
    deconv_channels: dict[int, int] | None = None,
    pred_channels: int = 2,
) -> None:
    """Parameter shapes for :func:`refinement_decoder`. ``pred_channels``:
    2 for flow, 1 for disparity (DispNet)."""
    if deconv_channels is None:
        deconv_channels = {5: 512, 4: 256, 3: 128, 2: 64}
    top = levels[0]
    pi.conv(f"predict_flow{top}", 3, feature_channels[top], pred_channels)
    link_c = feature_channels[top]
    for lvl in levels[1:]:
        dc = deconv_channels[lvl]
        pi.deconv(f"deconv{lvl}", 4, link_c, dc)
        pi.deconv(f"upsample_flow{lvl + 1}to{lvl}", 4, pred_channels, pred_channels)
        link_c = feature_channels[lvl] + dc + pred_channels
        pi.conv(f"predict_flow{lvl}", 3, link_c, pred_channels)
