"""Fixed-point flow codec used by the packed dataset format.

The reference packs ground-truth flow into LMDB as int16 fixed point:
``int16 = round(flow * 32)`` with NaN (invalid pixels) mapped to SHRT_MAX
(reference: tools/convert_imageset_and_flow.cpp:169-181), and decodes as
``float = int16 / 32.0`` with SHRT_MAX → NaN
(reference: src/caffe/layers/custom_data_layer.cpp:94-112, "UINT16FLOW").

We keep the identical on-disk contract so datasets packed by either framework
interchange losslessly.
"""

from __future__ import annotations

import numpy as np

FLO_SCALE = 32.0
FLO_NAN_SENTINEL = np.int16(32767)  # SHRT_MAX


def encode_flow_int16(flow: np.ndarray) -> np.ndarray:
    """float32 flow (any shape) → int16, NaN → SHRT_MAX, saturating."""
    flow = np.asarray(flow, dtype=np.float32)
    scaled = np.round(flow * FLO_SCALE)
    nan_mask = ~np.isfinite(scaled)
    scaled = np.where(nan_mask, 0.0, scaled)
    clipped = np.clip(scaled, -32768, 32766).astype(np.int16)
    return np.where(nan_mask, FLO_NAN_SENTINEL, clipped)


def decode_flow_int16(data: np.ndarray) -> np.ndarray:
    """int16 → float32 flow; SHRT_MAX → NaN."""
    data = np.asarray(data, dtype=np.int16)
    out = data.astype(np.float32) / FLO_SCALE
    return np.where(data == FLO_NAN_SENTINEL, np.float32(np.nan), out)


def decode_flow_int16_device(data) -> "jax.Array":  # noqa: F821
    """Device-side (jax) twin of :func:`decode_flow_int16`, for batches that
    travel host→device in the TRANSPORT domain (int16 fixed point, 2 bytes/
    value instead of 4): the decode runs inside the jitted step, halving the
    upload bytes — the same reason the reference ships UINT16FLOW datums to
    the GPU era's host RAM instead of floats (custom_data_layer.cpp:94-112).
    """
    import jax.numpy as jnp

    data = data.astype(jnp.int16)
    out = data.astype(jnp.float32) * (1.0 / FLO_SCALE)
    return jnp.where(data == jnp.int16(FLO_NAN_SENTINEL), jnp.float32(jnp.nan), out)


def flow_as_f32_device(flow) -> "jax.Array":  # noqa: F821
    """Normalize a flow batch to float32 on device, whatever domain it
    arrived in: int16 transport records decode (×1/32, SHRT_MAX→NaN);
    floating inputs just cast. The single entry point every objective uses
    so transport-domain batches work everywhere."""
    import jax.numpy as jnp

    if flow.dtype == jnp.int16:
        return decode_flow_int16_device(flow)
    return flow.astype(jnp.float32)


def encode_occlusion_bits(occ: np.ndarray) -> np.ndarray:
    """Bit-pack a boolean occlusion map row-major into uint8.

    Contract: bit i of byte i//8 is pixel i (reference:
    tools/convert_imageset_and_flow.cpp packs occlusion as 1 bit/px, decoded at
    custom_data_layer.cpp:113-128, "BOOL1").
    """
    flat = np.asarray(occ).reshape(-1).astype(bool)
    return np.packbits(flat, bitorder="little")


def decode_occlusion_bits(data: np.ndarray, shape: tuple[int, ...]) -> np.ndarray:
    """Unpack uint8 bits → boolean array of ``shape``."""
    n = int(np.prod(shape))
    flat = np.unpackbits(np.asarray(data, dtype=np.uint8), count=n, bitorder="little")
    return flat.astype(bool).reshape(shape)
