"""Mean layer: add/subtract a mean with input/output/mean scales.

Reference: src/caffe/layers/mean_layer.cpp:33-70 (MeanParameter
caffe.proto:679-691). Modes: per-channel mean values (``mean_values``) or a
full mean blob (``mean_array``); operation ADD or SUBTRACT;
out = (in * input_scale ± mean * mean_scale) * output_scale.

Used by the deploy nets for fixed RGB mean subtraction; the FlowNet2
cascade instead recomputes the mean from the inputs
(models.flownet2.normalize_images).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def apply_mean(
    x: jnp.ndarray,
    *,
    mean_values: Optional[Sequence[float]] = None,
    mean_array: Optional[jnp.ndarray] = None,
    operation: str = "subtract",
    input_scale: float = 1.0,
    mean_scale: float = 1.0,
    output_scale: float = 1.0,
) -> jnp.ndarray:
    """x: (..., C). Exactly one of mean_values / mean_array must be given."""
    if (mean_values is None) == (mean_array is None):
        raise ValueError("provide exactly one of mean_values or mean_array")
    if mean_values is not None:
        mean = jnp.asarray(list(mean_values), x.dtype)
    else:
        mean = mean_array.astype(x.dtype)
    out = x * input_scale
    if operation == "subtract":
        out = out - mean * mean_scale
    elif operation == "add":
        out = out + mean * mean_scale
    else:
        raise ValueError(f"unknown mean operation {operation!r}")
    return out * output_scale
