"""Parallelism: mesh + sharding (replaces src/caffe/parallel.cpp entirely).

The reference's only strategy was single-node synchronous data parallelism
over a CUDA-P2P memcpy tree (SURVEY.md §2.4). Here parallelism is declared,
not programmed: a ``jax.sharding.Mesh`` with (data, spatial) axes, sharding
annotations on the train-step inputs, and XLA inserting the psum /
halo-exchange collectives over ICI inside the compiled program. Multi-host
(DCN) extends the same mesh via jax.distributed.
"""

from flownet2_tpu.parallel.mesh import make_mesh, MeshConfig
from flownet2_tpu.parallel.annotate import activation_sharding, constrain_act
from flownet2_tpu.parallel.data_parallel import (
    shard_batch,
    make_dp_train_step,
    make_parallel_train_step,
    replicate,
)

__all__ = [
    "make_mesh",
    "MeshConfig",
    "activation_sharding",
    "constrain_act",
    "shard_batch",
    "make_dp_train_step",
    "make_parallel_train_step",
    "replicate",
]
