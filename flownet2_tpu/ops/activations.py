"""Pointwise activations used by the FlowNet nets.

Reference semantics: ReLU with ``negative_slope`` (leaky) from the stock layer
set, and the custom NegReLU = min(x,0) + slope*max(x,0)
(reference: src/caffe/layers/neg_relu_layer.cpp:25-40).

These are trivially fused by XLA into adjacent convs, so no Pallas is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    """max(x, 0) + negative_slope * min(x, 0). FlowNet uses slope 0.1."""
    return jnp.where(x >= 0, x, x * negative_slope)


def neg_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    """Mirrored leaky ReLU: passes negatives, scales positives by ``slope``."""
    return jnp.where(x < 0, x, x * slope)
