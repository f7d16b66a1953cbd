"""Async host-side batch prefetch loader.

The reference feeds its GPU from forked DataLoader worker processes reading
the shared mmap (reference embedding_cache.py:918-958, config/train.yaml
dataset_workers: 8). On TPU the equivalent is a background-thread prefetcher
that assembles numpy batches from the memory map and (optionally) initiates
the host→HBM transfer with jax.device_put under a target sharding while the
device computes the previous step — a double-buffered input pipeline.
"""

from __future__ import annotations

import queue
import random as _random
import threading
from typing import Any, Iterator, Optional

import numpy as np


class BatchLoader:
    """Iterates a batch-item dataset with background prefetching.

    Each epoch: optionally draws a new circular offset (training mode), then
    yields dataset[0..len).  With device_put, batches are moved to the device
    (sharded if a sharding is given) as part of prefetch so the consumer
    overlaps transfer with compute; `put_workers` transfers run CONCURRENTLY
    (ordering preserved via futures) — measured 2× effective bandwidth on a
    relayed host→device path (BENCH_NOTES round 4: the axon tunnel serves
    13.9 MB/s serially but 27.8 MB/s at 4 concurrent puts; a local PCIe host
    is fast either way and unaffected).
    """

    def __init__(self, dataset, prefetch: int = 2, device_put: bool = False,
                 sharding: Any = None, seed: Optional[int] = None,
                 put_workers: int = 4):
        self.dataset = dataset
        self.prefetch = max(prefetch, 1)
        self.device_put = device_put
        self.sharding = sharding
        self.put_workers = max(put_workers, 1)
        self.rng = _random.Random(seed)

    def __len__(self) -> int:
        return len(self.dataset)

    def _put(self, batch):
        if not self.device_put:
            return batch
        import jax

        def put(x):
            if x is None:
                return None
            x = np.ascontiguousarray(x)
            if self.sharding is not None:
                return jax.device_put(x, self.sharding)
            return jax.device_put(x)

        return tuple(put(x) for x in batch)

    def __iter__(self) -> Iterator:
        if hasattr(self.dataset, "new_epoch"):
            self.dataset.new_epoch(self.rng)
        n = len(self.dataset)
        workers = self.put_workers if self.device_put else 1
        # In-flight bound covers both prefetched host batches and concurrent
        # transfers; futures keep delivery order deterministic
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, workers))
        stop = threading.Event()
        pool = None
        if workers > 1:
            import concurrent.futures as _cf

            pool = _cf.ThreadPoolExecutor(max_workers=workers,
                                          thread_name_prefix="novic-put")

        def producer():
            try:
                for i in range(n):
                    if stop.is_set():
                        return
                    batch = self.dataset[i]
                    if pool is not None:
                        q.put((False, pool.submit(self._put, batch)))
                    else:
                        q.put((False, self._put(batch)))
                q.put((True, None))
            except BaseException as e:  # surface worker errors to the consumer
                q.put((None, e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                done, item = q.get()
                if done is None:
                    raise item
                if done:
                    return
                yield item.result() if pool is not None else item
        finally:
            stop.set()
            # Drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
