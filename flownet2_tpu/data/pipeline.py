"""Prefetching batch loader: the DataReader/BlockingQueue analogue.

Reference architecture (SURVEY.md §2.1): one reader thread per source
filling free/full BlockingQueue rings of pre-decoded batches
(include/caffe/data_reader.hpp:23-49, base_data_layer.hpp:74-79). Here:
a thread pool decodes samples, a bounded queue holds ready host batches,
and the consumer overlaps host decode with device steps. Optional host-side
spatial-augmentation coefficient sampling happens here too (the device
applies the warps inside the jitted train step — see ops/augment.py).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np


class DevicePrefetcher:
    """Double-buffered host→device staging: a background thread uploads
    batches ahead of consumption so H2D transfer overlaps the device step
    (the device-side half of the reference's prefetch overlap — its
    ``async_gpu_push`` on SyncedMemory + prefetch threads, syncedmem.hpp:
    45-83, base_data_layer.hpp:74-79; VERDICT r3 next.1c).

    Wraps any batch iterator; yields the same dicts with every array
    already device-resident. ``depth`` bounds staged batches (HBM held =
    depth × batch bytes). Upload stalls land in this thread, never in the
    training loop's dispatch path.
    """

    def __init__(self, batches, *, depth: int = 2, device=None):
        self.batches = batches
        self.depth = depth
        self.device = device

    def __iter__(self) -> Iterator[dict]:
        import jax

        device = self.device or jax.devices()[0]
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            try:
                for batch in self.batches:
                    if stop.is_set():
                        return
                    q.put(jax.device_put(batch, device))
            except Exception as e:  # surface upload/decode errors
                q.put(e)
                return
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class BatchLoader:
    """Iterates batches {img0, img1, flow[, occ]} of stacked (N,H,W,C)
    float32 arrays, prefetched by background threads.

    Samples whose resolution differs from (crop_h, crop_w) are center-cropped
    or skipped (uniform static shapes are a TPU requirement; the reference's
    training nets also fix crop sizes via the augmentation crop).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        crop: Optional[tuple[int, int]] = None,
        shuffle_seed: Optional[int] = 0,
        block_size: int = 1,
        num_threads: int = 2,
        prefetch: int = 4,
        epochs: Optional[int] = None,
        transform: Optional[Callable[[dict, np.random.Generator], dict]] = None,
    ):
        from flownet2_tpu.core.hostmem import tune_host_allocator

        # the prefetch ring churns batch-sized host buffers every step;
        # without this, glibc mmap/munmaps each one (page-zero tax per batch)
        tune_host_allocator()
        self.dataset = dataset
        self.batch_size = batch_size
        self.crop = crop
        self.shuffle_seed = shuffle_seed
        self.block_size = block_size
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.epochs = epochs
        self.transform = transform

    def _index_stream(self) -> Iterator[int]:
        epoch = 0
        while self.epochs is None or epoch < self.epochs:
            if self.shuffle_seed is not None and hasattr(self.dataset, "permutation"):
                order = self.dataset.permutation(
                    self.shuffle_seed + epoch, self.block_size
                )
            else:
                order = np.arange(len(self.dataset))
            yield from order
            epoch += 1

    def _center_crop(self, arr: np.ndarray) -> np.ndarray:
        if self.crop is None:
            return arr
        ch, cw = self.crop
        h, w = arr.shape[:2]
        if (h, w) == (ch, cw):
            return arr
        if h < ch or w < cw:
            raise ValueError(f"sample {h}x{w} smaller than crop {ch}x{cw}")
        y0 = (h - ch) // 2
        x0 = (w - cw) // 2
        return arr[y0 : y0 + ch, x0 : x0 + cw]

    def __iter__(self) -> Iterator[dict]:
        idx_iter = self._index_stream()
        idx_lock = threading.Lock()
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        n_done = [0]
        done_lock = threading.Lock()

        def worker(wid: int):
            rng = np.random.default_rng((self.shuffle_seed or 0) * 1000 + wid)
            while not stop.is_set():
                items = []
                with idx_lock:
                    try:
                        for _ in range(self.batch_size):
                            items.append(next(idx_iter))
                    except StopIteration:
                        pass
                if len(items) < self.batch_size:
                    break
                try:
                    samples = [self.dataset[int(i)] for i in items]
                    samples = [
                        {k: self._center_crop(v) for k, v in s.items()}
                        for s in samples
                    ]
                    batch = {
                        k: np.stack([s[k] for s in samples])
                        for k in samples[0]
                    }
                    if self.transform is not None:
                        batch = self.transform(batch, rng)
                    out_q.put(batch)
                except Exception as e:  # surface decode errors to consumer
                    out_q.put(e)
                    break
            with done_lock:
                n_done[0] += 1
                if n_done[0] == self.num_threads:
                    out_q.put(None)

        threads = [
            threading.Thread(target=worker, args=(i,), daemon=True)
            for i in range(self.num_threads)
        ]
        for t in threads:
            t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so workers blocked on put() can exit
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break
