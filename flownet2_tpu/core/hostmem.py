"""Host allocator tuning for large-tensor churn.

The framework's host side (param init, batch assembly, the prefetch ring,
the CPU dry runs) allocates and frees many multi-MB buffers per step. With
glibc's defaults every allocation above M_MMAP_THRESHOLD (128 KB) is a
fresh anonymous mmap that is unmapped on free — so each one repays the
kernel's page-zeroing cost on first touch. On the virtualized hosts this
framework targets, that cost is extreme (measured here: ~6 s to first-touch
a 67 MB buffer, ~16 MB/s — vs ~14 ms once the allocator reuses memory, a
~400x difference) and it shows up as the mysterious "sys time" tax on any
loop that churns image batches.

``tune_host_allocator`` raises the mmap threshold and disables heap trim so
glibc serves big buffers from the reused heap: the zeroing cost is paid
once per high-water mark instead of once per allocation. This is the same
class of fix as the reference pinning its host buffers for DMA
(syncedmem.hpp's CaffeMallocHost cudaMallocHost path) — host memory
management is part of the framework, not an afterthought.

No-ops gracefully off glibc/Linux. Trade-off: freed big buffers are kept by
the process (RSS stays at high water), which is exactly what a dedicated
training/serving host wants.
"""

from __future__ import annotations

import ctypes

# glibc mallopt parameter numbers (bits/malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3

_done = False


def tune_host_allocator() -> bool:
    """Raise glibc's mmap threshold / disable trim. Idempotent.

    Returns True if the tuning was applied (glibc present and mallopt
    accepted both settings), False otherwise.
    """
    global _done
    if _done:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)) and bool(
            libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
        )
    except OSError:  # pragma: no cover - non-glibc platform
        return False
    _done = ok
    return ok
