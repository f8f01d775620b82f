"""Mean handling for the augmentation engine (DataAugmentationLayer's
recompute_mean / mean / mean_per_pixel, data_augmentation_layer.cu:592-635,
cpp:136-155).

Reference semantics:

- ``recompute_mean = K > 0``: a per-pixel running mean of the AUGMENTED
  images is updated for the first K iterations —
  ``mean_t = (mean_{t-1}·(t-1) + batch_mean) / t`` — then frozen. Each
  iteration subtracts either the per-pixel mean (``mean_per_pixel``) or its
  spatial average per channel. The mean and the iteration counter are
  stored as non-learnable layer blobs so they snapshot/restore
  (cpp:44-56, adjust_blobs cpp:164-185).
- else ``mean: [r, g, b]``: subtract a fixed per-channel mean (cpp:142-155).

TPU-native split: the update+subtract math runs INSIDE the jitted train
step (:func:`recompute_mean_and_subtract` — called by the augmentation
apply path with the running mean passed in through the batch), and the
host-side :class:`MeanRecompute` mirrors the recursion from the
``aug_batch_mean`` the step returns in its aux dict, so the host copy fed
to the next step is always exactly the reference's blob state.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax.numpy as jnp


def recompute_mean_and_subtract(
    images: jnp.ndarray,
    mean: jnp.ndarray,
    num_iter: jnp.ndarray,
    *,
    window: int,
    per_pixel: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One iteration of the reference recursion, inside jit.

    images: (N, H, W, C) augmented batch; mean: (H, W, C) running mean
    BEFORE this iteration; num_iter: scalar int32, 1-based iteration count
    (the reference increments blobs_[0] before the update).

    Returns (images - mean', batch_mean) where
    mean' = (mean·(t-1) + batch_mean)/t while t <= window, else mean.
    The caller folds batch_mean into its host-side state via
    :meth:`MeanRecompute.update`.
    """
    x = images.astype(jnp.float32)
    batch_mean = jnp.mean(x, axis=0)  # (H, W, C)
    t = num_iter.astype(jnp.float32)
    updated = (mean * (t - 1.0) + batch_mean) / t
    mean_now = jnp.where(num_iter <= window, updated, mean)
    if per_pixel:
        sub = mean_now
    else:
        sub = jnp.mean(mean_now, axis=(0, 1), keepdims=True)  # per channel
    return (x - sub).astype(images.dtype), batch_mean


def subtract_fixed_mean(images: jnp.ndarray, rgb_mean) -> jnp.ndarray:
    """The fixed proto mean path (cpp:142-155): subtract one value per
    channel everywhere."""
    m = jnp.asarray(rgb_mean, jnp.float32).reshape(1, 1, 1, -1)
    return (images.astype(jnp.float32) - m).astype(images.dtype)


@dataclass
class MeanRecompute:
    """Host-side mirror of the reference's mean blobs.

    Attach the current state to each batch (:meth:`attach`), run the step,
    then :meth:`update` with the ``aug_batch_mean`` aux the step returned.
    ``state_dict``/``load_state_dict`` make it snapshot alongside the
    TrainState (the reference stores these as layer blobs so they ride the
    .caffemodel, cpp:44-56).
    """

    height: int
    width: int
    channels: int = 3
    window: int = 1000
    per_pixel: bool = False

    def __post_init__(self):
        self.mean = np.zeros((self.height, self.width, self.channels), np.float32)
        self.num_iter = 0

    def attach(self, batch: dict, *, key: str = "mean_image0") -> dict:
        """Add the running-mean arrays to a host batch (consumed by the
        augmentation apply path). ``key`` selects the frame —
        ``mean_image0``/``mean_image1`` — since the reference wires one
        DataAugmentation layer (with its own mean blobs) per frame."""
        out = dict(batch)
        out[key] = self.mean
        out["mean_iter"] = np.asarray(self.num_iter + 1, np.int32)  # 1-based
        return out

    def update(self, batch_mean: np.ndarray) -> None:
        """Fold one iteration's batch mean in (cu:600-608)."""
        self.num_iter += 1
        t = self.num_iter
        if t <= self.window:
            self.mean = ((self.mean * (t - 1)) + np.asarray(batch_mean, np.float32)) / t

    @property
    def per_channel(self) -> np.ndarray:
        return self.mean.mean(axis=(0, 1))

    # -- persistence (write_mean / mean-file handling)
    def state_dict(self) -> dict:
        return {"mean": self.mean.copy(), "num_iter": self.num_iter}

    def load_state_dict(self, d: dict) -> None:
        mean = np.asarray(d["mean"], np.float32)
        if mean.shape != self.mean.shape:
            raise ValueError(f"mean shape {mean.shape} != {self.mean.shape}")
        self.mean = mean
        self.num_iter = int(d["num_iter"])

    def write_mean(self, path: str) -> str:
        """Dump the running mean (the ``write_mean`` debug option,
        caffe.proto:496) as a float blob readable by
        tools.writers.read_float_blob, plus a .ppm preview."""
        from flownet2_tpu.tools.writers import _write_float_blob
        from flownet2_tpu.core.flow_io import write_ppm

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        _write_float_blob(path, self.mean)
        preview = np.clip(self.mean * 255.0, 0, 255).astype(np.uint8)
        write_ppm(os.path.splitext(path)[0] + ".ppm", preview)
        return path

    @classmethod
    def from_mean_file(cls, path: str, *, window: int = 0, per_pixel: bool = True) -> "MeanRecompute":
        """Load a pre-computed per-pixel mean (the reference's mean-file /
        adjust_blobs restore path) — window=0 freezes it."""
        from flownet2_tpu.tools.writers import read_float_blob

        mean = np.asarray(read_float_blob(path), np.float32)
        if mean.ndim != 3:
            raise ValueError(f"mean blob must be (H, W, C), got {mean.shape}")
        obj = cls(*mean.shape, window=window, per_pixel=per_pixel)
        obj.mean = mean
        obj.num_iter = max(window, 1)
        return obj
