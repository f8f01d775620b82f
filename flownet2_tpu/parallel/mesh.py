"""Device mesh construction.

Axes:
- ``data``    — batch (data parallelism; the replacement for P2PSync's
                per-GPU solver threads, parallel.cpp:152-437);
- ``spatial`` — image height (spatial partitioning: XLA SPMD inserts halo
                exchanges for convolutions automatically). This is the
                framework's "sequence parallelism" analogue — for optical
                flow the scaling dimension is resolution (SURVEY.md §5).

Multi-host: call jax.distributed.initialize() before make_mesh(); device
order keeps DCN as the outermost (data) axis so spatial halos ride ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    spatial: int = 1


def make_mesh(config: MeshConfig = MeshConfig(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    spatial = config.spatial
    data = config.data if config.data > 0 else n // spatial
    if data * spatial != n:
        raise ValueError(
            f"mesh {data}x{spatial} does not cover {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, spatial)
    return Mesh(dev_array, axis_names=("data", "spatial"))
