"""Host↔device latency/bandwidth budget of the accelerator link.

Backs the DESIGN_NOTES "End-to-end training latency budget" table. On the
remote-TPU (axon) tunnel this stack runs on, the link — not the framework —
bounds naive streaming training (measured ~25 MB/s H2D, ~50 ms sync
round-trip), which is what motivated the device sample cache
(data/device_cache.py) and K-step dispatch (train/solver.py solve_cached).

Measures:
- scalar host fetch round-trip (the cost of every float(loss));
- H2D bandwidth at 1/4/16/64 MB puts;
- D2H fetch of a 16 MB buffer;
- jitted no-op dispatch without sync.

Run: python -m flownet2_tpu.tools.diag.diag_tunnel
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev})")

    # scalar round-trip: put + tiny compute + host fetch, data-dependent so
    # nothing dedups
    x = jnp.zeros([], jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    float(f(x))  # compile
    t0 = time.perf_counter()
    n = 20
    acc = x
    for _ in range(n):
        acc = f(acc)
        float(acc)  # force the round-trip every iteration
    rt = (time.perf_counter() - t0) / n
    print(f"scalar sync round-trip: {rt * 1e3:.1f} ms")

    # H2D bandwidth: device_put of fresh host buffers (unique contents so
    # no caching layer can dedup the transfer)
    rng = np.random.default_rng(0)
    for mb in (1, 4, 16, 64):
        nbytes = mb << 20
        bufs = [rng.integers(0, 255, nbytes, dtype=np.uint8) for _ in range(3)]
        # warm one
        jax.device_put(bufs[0]).block_until_ready()
        t0 = time.perf_counter()
        arrs = [jax.device_put(b) for b in bufs]
        # force: reduce each on device and fetch a scalar (block_until_ready
        # does not block through the tunnel — DESIGN_NOTES methodology)
        s = float(sum(jnp.sum(a.astype(jnp.uint32)) for a in arrs))
        dt = time.perf_counter() - t0
        assert s >= 0
        print(f"H2D {mb:3d} MB x3: {3 * mb / dt:8.1f} MB/s   ({dt:.2f}s)")

    # D2H fetch
    a = jax.device_put(rng.integers(0, 255, 16 << 20, dtype=np.uint8))
    float(jnp.sum(a.astype(jnp.uint32)))  # ensure resident
    t0 = time.perf_counter()
    h = np.asarray(a)
    dt = time.perf_counter() - t0
    print(f"D2H 16 MB: {16 / dt:8.1f} MB/s   ({dt:.3f}s)  [may be locally cached]")
    del h

    # dispatch without sync
    g = jax.jit(lambda a: a * 1.000001)
    arr = jax.device_put(np.ones(1024, np.float32))
    g(arr)  # compile
    t0 = time.perf_counter()
    n = 200
    for _ in range(n):
        arr = g(arr)
    dt = (time.perf_counter() - t0) / n
    float(jnp.sum(arr))
    print(f"jitted dispatch, no sync: {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
