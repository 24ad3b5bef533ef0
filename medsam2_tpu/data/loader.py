"""Input pipeline: threaded prefetching loader (replaces torch DataLoader
workers — ``func_3d/dataset/__init__.py:29-49``) with shuffling and an
epoch-based iterator. The optional native (C++) decode path plugs in through
the same interface (see ``medsam2_tpu/native``)."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np


def device_prefetch(iterator, size: int = 2):
    """Overlap host batch preparation + H2D transfer with device compute:
    eagerly `device_put`s up to ``size`` upcoming batches while the current
    step runs (the JAX analogue of torch's pin_memory+prefetch)."""
    import collections

    import jax

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(iterator)
            except StopIteration:
                return
            queue.append(jax.tree_util.tree_map(jax.device_put, batch))

    iterator = iter(iterator)
    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)


class DataLoader:
    """Minimal map-style loader: dataset with __len__/__getitem__, optional
    batching collate, background prefetch threads."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 collate_fn: Optional[Callable] = None, num_workers: int = 2,
                 seed: int = 0, drop_last: bool = False, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn or (lambda samples: samples)
        self.num_workers = max(num_workers, 0)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last
        self.prefetch = prefetch
        # np.random.Generator is not thread-safe: serialize item fetch for
        # datasets that sample prompts with a shared rng (collate still runs
        # in parallel across workers)
        self._fetch_lock = threading.Lock() if hasattr(dataset, "rng") else None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> List[List[int]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        batches = [idx[i:i + self.batch_size].tolist()
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator:
        batches = self._index_batches()
        if self.num_workers == 0:
            for b in batches:
                yield self.collate_fn([self.dataset[i] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch(i):
            if self._fetch_lock is not None:
                with self._fetch_lock:
                    return self.dataset[i]
            return self.dataset[i]

        def worker(batch_list):
            try:
                for b in batch_list:
                    if stop.is_set():
                        return
                    q.put((None, self.collate_fn([fetch(i) for i in b])))
            except Exception as e:  # surface worker errors to the consumer
                q.put((e, None))

        shards = [batches[w::self.num_workers] for w in range(self.num_workers)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True)
                   for s in shards if s]
        for t in threads:
            t.start()
        try:
            for _ in range(len(batches)):
                err, item = q.get()
                if err is not None:
                    raise err
                yield item
        finally:
            stop.set()
