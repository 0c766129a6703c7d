"""Data loading: sampler + threaded prefetching loader.

TPU-native replacement for the reference's torch DataLoader stack
(`/root/reference/Deraining/basicsr/data/__init__.py:29-120`,
`data_sampler.py:6-49` EnlargedSampler, `prefetch_dataloader.py:63-126`
prefetchers): JAX has no DataLoader, so this module provides

* `EnlargedSampler` — virtually enlarges the dataset by `ratio` so epoch
  boundaries don't interrupt long runs, shuffles per epoch with a seeded
  RNG, and shards indices per data-parallel process (rank/world for
  multi-host TPU; within one host the global batch is simply split over the
  mesh by `jax.device_put` sharding).
* `DataLoader` — a thread pool decodes samples (cv2 releases the GIL) into a
  bounded prefetch queue; batches are collated into numpy arrays, ready for
  a single host->device transfer (the CPU/CUDA-prefetcher analog: device
  transfer overlap is handled by JAX's async dispatch + `device_put`).
"""

from __future__ import annotations

import math
import queue
import random
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


class EnlargedSampler:
    def __init__(self, dataset_len: int, num_replicas: int = 1, rank: int = 0,
                 ratio: int = 1, shuffle: bool = True, seed: int = 0,
                 round_multiple: Optional[int] = None):
        """round_multiple: granularity the virtual dataset size is padded to
        (indices wrap mod dataset_len). Defaults to num_replicas — the
        reference pads to a multiple of world_size (`data_sampler.py:31-33`)
        so every rank always draws at least one sample even when the dataset
        is smaller than the device count; the single-controller caller
        passes the mesh device count here for the same guarantee."""
        self.dataset_len = dataset_len
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.shuffle = shuffle
        self.seed = seed
        # lcm keeps total_size divisible by num_replicas for ANY
        # round_multiple, so per-rank slices stay equal length (the
        # reference guarantees total = num_samples * world_size,
        # `data_sampler.py:31-33`)
        g = math.lcm(num_replicas, round_multiple or 1)
        self.total_size = -(-dataset_len * ratio // g) * g
        self.num_samples = self.total_size // num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self) -> Iterator[int]:
        if self.shuffle:
            g = np.random.RandomState(self.seed + self.epoch)
            indices = g.permutation(self.total_size)
        else:
            indices = np.arange(self.total_size)
        indices = indices[self.rank : self.total_size : self.num_replicas]
        return iter((indices % self.dataset_len).tolist())


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals, axis=0)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Threaded, order-preserving, prefetching batch loader."""

    def __init__(self, dataset, batch_size: int = 1, sampler=None,
                 shuffle: bool = False, num_workers: int = 4,
                 drop_last: bool = True, prefetch_batches: int = 4,
                 seed: int = 0, collate_fn=default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.seed = seed
        self.collate_fn = collate_fn
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None:
            self.sampler.set_epoch(epoch)

    def _indices(self) -> List[int]:
        if self.sampler is not None:
            return list(self.sampler)
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idx)
        return idx

    def __len__(self):
        n = (len(self.sampler) if self.sampler is not None
             else len(self.dataset))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        task_q: "queue.Queue" = queue.Queue()
        results: Dict[int, Any] = {}
        results_lock = threading.Lock()
        stop = threading.Event()

        for bi, batch in enumerate(batches):
            task_q.put((bi, batch))

        def worker(worker_id: int):
            rng = random.Random(self.seed * 100003 + self._epoch * 1009
                                + worker_id)
            while not stop.is_set():
                try:
                    bi, batch_idx = task_q.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = []
                    for i in batch_idx:
                        try:
                            samples.append(
                                self.dataset.__getitem__(i, rng=rng)
                            )
                        except TypeError:
                            samples.append(self.dataset[i])
                    res = self.collate_fn(samples)
                except Exception as e:  # surface errors to the consumer
                    res = e
                with results_lock:
                    results[bi] = res

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        try:
            for bi in range(len(batches)):
                while True:
                    with results_lock:
                        if bi in results:
                            res = results.pop(bi)
                            break
                    threading.Event().wait(0.002)
                if isinstance(res, Exception):
                    raise res
                yield res
        finally:
            stop.set()


class DevicePrefetcher:
    """Device-side double-buffered prefetch — the reference
    CUDAPrefetcher's TPU analog (`/root/reference/Deraining/basicsr/data/
    prefetch_dataloader.py:84-126`, side-stream pinned-memory H2D): when
    `next()` hands batch N to the train loop, batch N+1's host->device
    transfer has already been issued (JAX dispatch is async), so the DMA
    overlaps step N's compute instead of serializing inside feed_data.

    put: starts the transfer (typically `model.put_batch`).
    transform: optional host-side batch transform applied BEFORE the
    transfer (progressive-learning cropping), called as
    `transform(batch, seq)` with the 1-based sequence number the batch
    will be consumed at — shapes must be final before the device copy.
    """

    def __init__(self, prefetcher: "InfinitePrefetcher", put,
                 transform=None):
        self.prefetcher = prefetcher
        self.put = put
        self.transform = transform
        self._seq = 0
        self._next: Optional[Dict[str, Any]] = None
        self._preload()

    @property
    def epoch(self):
        return self.prefetcher.epoch

    def _preload(self):
        batch = self.prefetcher.next()
        self._seq += 1
        if self.transform is not None:
            batch = self.transform(batch, self._seq)
        self._next = self.put(batch)

    def next(self) -> Dict[str, Any]:
        batch = self._next
        self._preload()
        return batch


class InfinitePrefetcher:
    """Wraps a DataLoader into a never-ending iterator, advancing epochs —
    the reference's `prefetcher.next()` + epoch loop
    (`train_pipeline.py:166-213`)."""

    def __init__(self, loader: DataLoader, start_epoch: int = 0):
        self.loader = loader
        self.epoch = max(0, start_epoch)
        self.loader.set_epoch(self.epoch)
        self._it = iter(self.loader)

    def next(self):
        try:
            return next(self._it)
        except StopIteration:
            self.epoch += 1
            self.loader.set_epoch(self.epoch)
            self._it = iter(self.loader)
            try:
                return next(self._it)
            except StopIteration:
                raise RuntimeError(
                    "train loader yields no batches — dataset smaller than "
                    "the global batch (len(dataset)*enlarge_ratio < "
                    "batch_size_per_gpu*num_gpu after drop_last)?"
                ) from None
