"""Data pipeline: streaming datasets + prefetching loader.

Replaces the reference's LMDB path (DataReader/CustomData,
SURVEY.md §2.1/§2.2) with direct file streaming plus an optional packed
record format that keeps the reference's exact datum encoding (uint8 images,
int16 ×32 fixed-point flow, bit-packed occlusions). Existing reference-
packed LMDBs remain drop-in readable via the pure-Python shim in
flownet2_tpu.data.lmdb (no liblmdb needed), and LevelDB-packed ones via
flownet2_tpu.data.leveldb (no leveldb/snappy needed).
"""

from flownet2_tpu.data.datasets import (
    FlowPairDataset,
    FlyingChairs,
    FlyingThings3D,
    ChairsSDHom,
    open_dataset,
)
from flownet2_tpu.data.leveldb import LevelDBFlowDataset, LevelDBReader
from flownet2_tpu.data.lmdb import LmdbFlowDataset, LmdbReader
from flownet2_tpu.data.records import FlowRecordReader, FlowRecordWriter
from flownet2_tpu.data.pipeline import BatchLoader, DevicePrefetcher
from flownet2_tpu.data.device_cache import (
    CacheBatches,
    DeviceSampleCache,
    cycle_dataset,
    make_cache_gather_loss,
)

__all__ = [
    "CacheBatches",
    "DeviceSampleCache",
    "cycle_dataset",
    "make_cache_gather_loss",
    "FlowPairDataset",
    "FlyingChairs",
    "FlyingThings3D",
    "ChairsSDHom",
    "open_dataset",
    "LevelDBFlowDataset",
    "LevelDBReader",
    "LmdbFlowDataset",
    "LmdbReader",
    "FlowRecordReader",
    "FlowRecordWriter",
    "BatchLoader",
    "DevicePrefetcher",
]
