"""flownet2-tpu: a TPU-native optical-flow framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lmb-freiburg/flownet2 (the Caffe fork released with FlowNet 2.0, CVPR 2017):

- ``core``     — flow/image file formats (.flo/PFM/PPM), fixed-point flow codec,
                 /64 shape adaptation (the reference's $ADAPTED_*$ contract).
- ``ops``      — the custom operator set (correlation cost volume, flow warping,
                 channel norm, NaN-aware downsample, resample, robust losses,
                 augmentation) as pure-JAX reference impls + fused Pallas kernels.
- ``models``   — FlowNetS / FlowNetC / FlowNetSD / fusion net and the stacked
                 FlowNet2 cascade, each a single jit-compiled XLA program.
- ``data``     — LMDB-free streaming datasets (FlyingChairs, FlyingThings3D,
                 ChairsSDHom) with host-side decode and device-side augmentation.
- ``train``    — solver (optax), Caffe-compatible LR policies, multi-scale EPE
                 supervision, orbax checkpointing.
- ``parallel`` — jax.sharding mesh definitions and the data-parallel train step
                 (replaces the reference's CUDA-P2P tree in src/caffe/parallel.cpp).
- ``cli``      — run-flownet / run-flownet-many compatible entry points plus
                 train/test/time commands.
"""

__version__ = "0.1.0"
