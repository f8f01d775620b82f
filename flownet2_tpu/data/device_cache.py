"""Device-resident sample cache: train at compute speed when the host→device
link can't feed the optimizer fresh data every step.

The reference keeps the GPU fed with prefetch threads + BlockingQueue rings
(custom_data_layer.cpp:139-305, base_data_layer.hpp:74-79) — enough when the
PCIe link outruns the solver. On a TPU the same architecture exists here
(data/pipeline.BatchLoader), but when the host link is the bottleneck (slow
NFS, a remote-device tunnel, or simply a step time shorter than one batch's
upload) no amount of host prefetch helps: the wire is the wall. This module
adds the device-side half of the overlap the reference never needed:

- a ring of **slabs** (groups of samples) lives in HBM in the TRANSPORT
  domain (uint8 images + int16 fixed-point flow — the reference's own LMDB
  datum encoding, custom_data_layer.cpp:94-112), ~2 MB per 384×512 sample;
- each training step draws a batch by INDEX from one slab — an on-device
  gather inside the jitted step, zero per-step H2D traffic — and augments
  it with fresh random crops/affines/chromatic coefficients, so repeated
  draws of one cached sample still yield distinct training examples
  ("data echoing" with augmentation, Choi et al. 2019, arXiv:1907.05550);
- a background thread continuously rebuilds slabs from the dataset stream
  and swaps them in (one ``device_put`` per slab, asynchronous, overlapped
  with compute): the cache converges to a rolling shuffled window of the
  dataset, refreshed at whatever rate the link actually sustains.

Slab swap is a host-reference swap of a freshly uploaded array group — no
in-place device update, no donation aliasing, safe against in-flight steps
(old slabs are freed when their last queued step retires). Drawing each
batch from a single slab mirrors the reference's block-wise shuffling
(rand_permute/block_size, custom_data_layer.cpp:29-42): correlation within
a slab is broken by the per-draw augmentation and the slab-level shuffle.

Sizing: FlyingChairs-native samples are ~2 MB in transport encoding, so a
16 GB-HBM chip holds a few thousand alongside FlowNetC (~160 MB params+opt).
With an infinitely fast link the echo factor approaches 1 (every draw hits
a fresh sample) and this degrades gracefully into an ordinary prefetcher.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterator, Optional

import numpy as np


class DeviceSampleCache:
    """HBM slab-ring of transport-domain samples with async host refresh.

    ``sample_iter`` yields sample dicts of HWC numpy arrays (any dtypes —
    uint8/int16 transport items from ``FlowRecordReader(transport=True)``
    give 3.2× cheaper uploads than f32). All samples must share shapes.

    Refresh throttling (measured necessity, round 5): an unthrottled
    refresh loop re-uploads slabs flat-out — on the remote-TPU tunnel it
    pushed 8.4 GB in 380 s (the dataset 44×) and its in-flight uploads
    head-of-line-blocked every training dispatch/sync behind them (chunk
    sync 1.0 s idle-link → 14-29 s under refresh). Two self-scaling caps:

    - ``min_echo``: a slab swap needs ``slab_samples * min_echo`` consumer
      draws since the last swap (``note_drawn`` — CacheBatches/CacheChunks
      report their draws). Replacing samples faster than they can be drawn
      is statistically pure waste; this also idles refresh while training
      is paused (compile, eval).
    - ``link_duty``: after an upload that took ``u`` seconds, the refresher
      sleeps ``u * (1 - duty) / duty`` — refresh may occupy at most
      ``duty`` of the link's time, bounding the average dispatch/sync
      latency it induces.

    On a fast local link (PCIe/DMA) both caps are no-ops in practice:
    uploads are milliseconds and draws outpace ``min_echo`` instantly.
    """

    def __init__(
        self,
        sample_iter: Iterator[dict],
        *,
        slab_samples: int = 64,
        n_slabs: int = 4,
        refresh: bool = True,
        device=None,
        min_echo: float = 0.25,
        link_duty: float = 0.25,
    ):
        import jax

        if slab_samples < 1 or n_slabs < 1:
            raise ValueError("slab_samples and n_slabs must be >= 1")
        if not 0 < link_duty <= 1:
            raise ValueError("link_duty must be in (0, 1]")
        self._iter = sample_iter
        self.slab_samples = slab_samples
        self.n_slabs = n_slabs
        self.min_echo = min_echo
        self.link_duty = link_duty
        self._device = device or jax.devices()[0]
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._next_swap = 0
        self.samples_uploaded = 0
        self.slabs_swapped = 0
        self.bytes_uploaded = 0
        self.samples_drawn = 0
        self._drawn_at_last_swap = 0
        # initial fill: synchronous so the first draw always works
        self._slabs = [self._build_and_upload() for _ in range(n_slabs)]
        self._thread: Optional[threading.Thread] = None
        if refresh:
            self._thread = threading.Thread(target=self._refresh_loop, daemon=True)
            self._thread.start()

    # -- host side ---------------------------------------------------------
    def _build_slab_host(self) -> dict:
        samples = []
        for _ in range(self.slab_samples):
            samples.append(next(self._iter))
        return {
            k: np.ascontiguousarray(np.stack([s[k] for s in samples]))
            for k in samples[0]
        }

    def _build_and_upload(self) -> dict:
        import jax

        host = self._build_slab_host()
        slab = {k: jax.device_put(v, self._device) for k, v in host.items()}
        self.samples_uploaded += self.slab_samples
        self.bytes_uploaded += sum(v.nbytes for v in host.values())
        return slab

    def _refresh_loop(self):
        import time

        need = max(1, int(self.slab_samples * self.min_echo))
        while not self._stop.is_set():
            # echo cap: wait until the consumer drew enough from the cache
            # that replacing a slab can matter
            while self.samples_drawn - self._drawn_at_last_swap < need:
                if self._stop.wait(0.05):
                    return
            t0 = time.monotonic()
            try:
                slab = self._build_and_upload()
            except StopIteration:
                return  # finite stream exhausted: cache keeps its last fill
            except Exception:
                if self._stop.is_set():
                    return
                raise
            upload_s = time.monotonic() - t0
            with self._lock:
                i = self._next_swap
                self._next_swap = (i + 1) % self.n_slabs
                self._slabs[i] = slab
                self.slabs_swapped += 1
                self._drawn_at_last_swap = self.samples_drawn
            # duty cap: leave the link idle for training traffic
            if self.link_duty < 1 and self._stop.wait(
                upload_s * (1 - self.link_duty) / self.link_duty
            ):
                return

    # -- consumer side -----------------------------------------------------
    def note_drawn(self, n: int):
        """Report ``n`` consumer sample-draws (feeds the refresh echo cap)."""
        self.samples_drawn += n  # benign race: int add, monotonic intent

    def draw_slab(self, rng: np.random.Generator) -> dict:
        """A uniformly random current slab (device arrays, ready to pass as
        jitted-step arguments)."""
        with self._lock:
            return self._slabs[int(rng.integers(self.n_slabs))]

    def current_slabs(self) -> tuple:
        """A consistent snapshot of ALL current slabs (for multi-step
        dispatch: indices address the concatenation in slab order)."""
        with self._lock:
            return tuple(self._slabs)

    def stats(self) -> dict:
        return {
            "slabs_swapped": self.slabs_swapped,
            "samples_uploaded": self.samples_uploaded,
            "bytes_uploaded": self.bytes_uploaded,
            "capacity_samples": self.slab_samples * self.n_slabs,
            "samples_drawn": self.samples_drawn,
        }

    def stop(self):
        self._stop.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def cycle_dataset(
    dataset, *, seed: Optional[int] = 0, block_size: int = 1
) -> Iterator[dict]:
    """Infinite shuffled sample stream over a dataset (re-shuffled per epoch
    with the CustomData block-shuffle semantics when available)."""
    epoch = 0
    while True:
        if seed is not None and hasattr(dataset, "permutation"):
            order = dataset.permutation(seed + epoch, block_size)
        else:
            order = np.arange(len(dataset))
        for i in order:
            yield dataset[int(i)]
        epoch += 1


class CacheBatches:
    """Batch iterator over a :class:`DeviceSampleCache` for ``Solver.solve``.

    Yields batch dicts of {cache_<field>: device slab arrays, cache_idx:
    (batch,) indices, aug_*: host coefficient arrays}. Pair with
    :func:`make_cache_gather_loss` so the jitted step gathers the batch from
    the slab on device. Per-step H2D = indices + coefficients (~KBs).

    Not compatible with ``Solver(mesh=...)``'s automatic ``shard_batch``
    (the slab's leading axis is cache capacity, not batch); multi-chip
    training feeds per-host BatchLoaders instead.
    """

    def __init__(
        self,
        cache: DeviceSampleCache,
        batch_size: int,
        *,
        seed: int = 0,
        aug_sampler: Optional[Callable[[np.random.Generator, int], dict]] = None,
    ):
        self.cache = cache
        self.batch_size = batch_size
        self.aug_sampler = aug_sampler
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        while True:
            slab = self.cache.draw_slab(self._rng)
            idx = self._rng.choice(
                self.cache.slab_samples,
                size=self.batch_size,
                replace=self.batch_size > self.cache.slab_samples,
            ).astype(np.int32)
            batch = {f"cache_{k}": v for k, v in slab.items()}
            batch["cache_idx"] = idx
            if self.aug_sampler is not None:
                batch.update(self.aug_sampler(self._rng, self.batch_size))
            self.cache.note_drawn(self.batch_size)
            yield batch


class CacheChunks:
    """K-step bank iterator over a :class:`DeviceSampleCache` for
    ``Solver.solve_cached`` / ``train.solver.make_multistep_train_step``.

    Yields ``(slabs, bank)``: ``slabs`` is the cache's current slab tuple
    (device arrays), ``bank`` a host dict of per-step arrays with leading
    axis K — ``cache_idx`` (K, batch) indices into the slab concatenation
    plus the ``aug_*`` coefficient arrays reshaped to (K, batch, ...). One
    chunk is one dispatch and ONE host→device transfer of ~K KBs, versus
    ~10 transfers per step for :class:`CacheBatches` — the difference
    between link-latency-bound and compute-bound training on a remote
    accelerator (r3 streaming measured 6.4 pairs/s through the 53 ms-RTT
    tunnel, docs/DESIGN_NOTES.md latency budget; the captured pipeline
    number is bench.py's train_flownetc_with_pipeline metric).

    Draw-semantics note vs :class:`CacheBatches`: a chunk's indices address
    the CONCATENATION of all resident slabs, while CacheBatches draws each
    batch from ONE randomly chosen slab. Both sample the same cached
    population uniformly; the chunk form mixes slabs WITHIN a batch (less
    intra-batch correlation — mild but strictly-no-worse shuffling), and a
    background slab refresh lands between chunks rather than between
    batches. Per-step training math is otherwise identical
    (tests/test_multistep.py pins chunked == sequential single-step).
    """

    def __init__(
        self,
        cache: DeviceSampleCache,
        batch_size: int,
        steps_per_dispatch: int,
        *,
        seed: int = 0,
        aug_sampler: Optional[Callable[[np.random.Generator, int], dict]] = None,
    ):
        if steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        self.cache = cache
        self.batch_size = batch_size
        self.steps_per_dispatch = steps_per_dispatch
        self.aug_sampler = aug_sampler
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        k, n = self.steps_per_dispatch, self.batch_size
        while True:
            slabs = self.cache.current_slabs()
            total = len(slabs) * self.cache.slab_samples
            idx = self._rng.integers(0, total, size=(k, n)).astype(np.int32)
            bank = {"cache_idx": idx}
            if self.aug_sampler is not None:
                arrs = self.aug_sampler(self._rng, k * n)
                bank.update(
                    {
                        name: v.reshape((k, n) + v.shape[1:])
                        for name, v in arrs.items()
                    }
                )
            self.cache.note_drawn(k * n)
            yield slabs, bank


def make_cache_gather_loss(inner_loss: Callable) -> Callable:
    """Wrap a loss so it first assembles the batch from cache slab arrays:
    ``batch[k] = batch["cache_" + k][batch["cache_idx"]]`` for every cached
    field — an on-device gather (~16 MB HBM reads for a batch of 8), then
    delegates. Compose outside ``make_augmented_loss``/``with_compute_
    dtype`` wrappers: gather → decode → augment → net."""
    import jax.numpy as jnp

    def loss_fn(params, batch):
        b = dict(batch)
        idx = b.pop("cache_idx")
        for key in [k for k in b if k.startswith("cache_")]:
            b[key[len("cache_"):]] = jnp.take(b.pop(key), idx, axis=0)
        return inner_loss(params, b)

    return loss_fn
