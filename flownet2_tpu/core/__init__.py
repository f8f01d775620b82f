"""Core utilities: file formats, flow codecs, shape adaptation."""

from flownet2_tpu.core.flow_io import (
    read_flo,
    write_flo,
    read_ppm,
    write_ppm,
    read_pfm,
    write_pfm,
    read_image,
)
from flownet2_tpu.core.codec import encode_flow_int16, decode_flow_int16, FLO_NAN_SENTINEL
from flownet2_tpu.core.adapt import adapt_shape, AdaptedGeometry
from flownet2_tpu.core.hostmem import tune_host_allocator

__all__ = [
    "read_flo",
    "write_flo",
    "read_ppm",
    "write_ppm",
    "read_pfm",
    "write_pfm",
    "read_image",
    "encode_flow_int16",
    "decode_flow_int16",
    "FLO_NAN_SENTINEL",
    "adapt_shape",
    "AdaptedGeometry",
    "tune_host_allocator",
]
