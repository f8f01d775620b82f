"""Fused Pallas TPU kernels for the hot custom ops.

Each kernel has a pure-JAX reference implementation in ``flownet2_tpu.ops``
(tested against numpy loop oracles); the Pallas versions are validated
against those references and selected automatically on TPU.
"""

from flownet2_tpu.ops.pallas.warp import flow_warp_pallas

__all__ = ["flow_warp_pallas"]
