"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference could only test multi-GPU paths with >=2 physical GPUs
(test_gradient_based_solver.cpp silently skips otherwise); we force
XLA's host platform with 8 virtual devices so every sharding/collective
test runs anywhere, per SURVEY.md §4's testing blueprint.

Must run before jax is imported anywhere.
"""

import os

# FLOWNET2_TPU_TESTS=1 keeps the session's real accelerator so the
# @pytest.mark.tpu-gated tests (compiled Pallas kernels vs exact VJPs at
# MXU precision) can run on hardware:
#   FLOWNET2_TPU_TESTS=1 python -m pytest tests/ -m tpu
# Default: virtual 8-device CPU mesh, TPU-gated tests skip.
_REAL_TPU = os.environ.get("FLOWNET2_TPU_TESTS") == "1"
if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _REAL_TPU:
    # sitecustomize may have pre-registered a TPU backend; force CPU regardless.
    jax.config.update("jax_platforms", "cpu")

from flownet2_tpu.core.hostmem import tune_host_allocator  # noqa: E402

# the suite churns large host/XLA:CPU buffers; glibc's default mmap/munmap
# per big allocation costs a page-zeroing tax per test on this host class
tune_host_allocator()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: needs a real TPU (run with FLOWNET2_TPU_TESTS=1); skipped on CPU",
    )
    config.addinivalue_line(
        "markers",
        "slow: multi-minute end-to-end run (set FLOWNET2_TPU_SLOW=1); "
        "skipped by default",
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("FLOWNET2_TPU_SLOW") != "1":
        skip_slow = pytest.mark.skip(reason="slow test (set FLOWNET2_TPU_SLOW=1)")
        for item in items:
            if "slow" in item.keywords:
                item.add_marker(skip_slow)
    if jax.default_backend() in ("tpu", "axon"):
        return
    skip = pytest.mark.skip(reason="real-TPU test (set FLOWNET2_TPU_TESTS=1)")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
