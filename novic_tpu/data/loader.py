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


class _PutJob:
    """A pending transfer: daemon-thread future (plain Event + result slot).

    Deliberately NOT concurrent.futures: its worker threads are non-daemon
    and joined at interpreter exit, so one transfer stuck inside a flaky
    relayed host→device path would make the process unkillable except by
    SIGKILL. Daemon threads keep the exit semantics of the single-threaded
    producer this replaces.
    """

    __slots__ = ("fn", "arg", "done", "result", "exc")

    def __init__(self, fn, arg):
        self.fn = fn
        self.arg = arg
        self.done = threading.Event()
        self.result = None
        self.exc = None

    def run(self):
        try:
            self.result = self.fn(self.arg)
        except BaseException as e:  # delivered to the consumer in order
            self.exc = e
        finally:
            self.done.set()

    def get(self):
        self.done.wait()
        if self.exc is not None:
            raise self.exc
        return self.result


class _DaemonPool:
    """Minimal ordered work pool on daemon threads (see _PutJob)."""

    def __init__(self, workers: int, name: str = "novic-put"):
        self.jobs: queue.Queue = queue.Queue()
        self.threads = [threading.Thread(target=self._worker, daemon=True,
                                         name=f"{name}-{i}")
                        for i in range(workers)]
        for t in self.threads:
            t.start()

    def _worker(self):
        while True:
            job = self.jobs.get()
            if job is None:
                return
            job.run()

    def submit(self, fn, arg) -> _PutJob:
        job = _PutJob(fn, arg)
        self.jobs.put(job)
        return job

    def shutdown(self):
        for _ in self.threads:
            self.jobs.put(None)


class BatchLoader:
    """Iterates a batch-item dataset with background prefetching.

    Each epoch: optionally draws a new circular offset (training mode), then
    yields dataset[0..len).  With device_put, batches are moved to the device
    (sharded if a sharding is given) as part of prefetch so the consumer
    overlaps transfer with compute; `put_workers` transfers run CONCURRENTLY
    (ordering preserved: jobs are queued and resolved in dataset order) —
    measured 2× effective bandwidth on a relayed host→device path
    (BENCH_NOTES round 4: the axon tunnel serves 13.9 MB/s serially but
    27.8 MB/s at 4 concurrent puts; a local PCIe host is fast either way and
    unaffected). The in-flight bound is max(prefetch, put_workers) batches —
    put_workers concurrent transfers need that many batches outstanding.
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
        # transfers; delivery order is dataset order either way
        q: queue.Queue = queue.Queue(maxsize=max(self.prefetch, workers))
        stop = threading.Event()
        pool = _DaemonPool(workers) if workers > 1 else None

        def producer():
            try:
                for i in range(n):
                    if stop.is_set():
                        return
                    batch = self.dataset[i]
                    if stop.is_set():
                        return
                    if pool is not None:
                        q.put((False, pool.submit(self._put, batch)))
                    else:
                        q.put((False, self._put(batch)))
                q.put((True, None))
            except BaseException as e:  # surface worker errors to the consumer
                q.put((None, e))
            finally:
                if pool is not None:
                    pool.shutdown()

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                done, item = q.get()
                if done is None:
                    raise item
                if done:
                    return
                yield item.get() if pool is not None else item
        finally:
            stop.set()
            # Drain so the producer can exit
            while thread.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
