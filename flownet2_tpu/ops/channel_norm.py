"""ChannelNorm: per-pixel L2 norm over the channel axis.

Reference: src/caffe/layers/channel_norm_layer.cpp:55-69 (forward:
out = sqrt(sum_c x^2), one output channel) and :124 (backward divides by
norm + 1e-9, which also regularizes the sqrt at 0).

The custom JVP reproduces the reference's epsilon-stabilized gradient exactly
(plain autodiff of sqrt would produce inf at zero vectors).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


@jax.custom_jvp
def channel_norm(x: jnp.ndarray) -> jnp.ndarray:
    """(..., C) → (..., 1): sqrt of the channel-wise sum of squares."""
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


@channel_norm.defjvp
def _channel_norm_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    norm = channel_norm(x)
    # d norm = sum_c x_c dx_c / (norm + eps) — reference channel_norm_layer.cpp:124
    dnorm = jnp.sum(x * dx, axis=-1, keepdims=True) / (norm + _EPS)
    return norm, dnorm
