"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference could only test multi-GPU paths with >=2 physical GPUs
(test_gradient_based_solver.cpp silently skips otherwise); we force
XLA's host platform with 8 virtual devices so every sharding/collective
test runs anywhere, per SURVEY.md §4's testing blueprint.

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have pre-registered a TPU backend; force CPU regardless.
jax.config.update("jax_platforms", "cpu")

from flownet2_tpu.core.hostmem import tune_host_allocator  # noqa: E402

# the suite churns large host/XLA:CPU buffers; glibc's default mmap/munmap
# per big allocation costs a page-zeroing tax per test on this host class
tune_host_allocator()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
