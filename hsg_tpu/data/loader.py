"""Background-prefetching batch loader.

Replaces the reference's torch DataLoader + pinned-memory H2D staging
(pyscripts/train/train.py:74-80, hsg/utils/general/others.py:50-73): a
thread pool decodes/augments batches ahead of the device, and the trainer
overlaps host batch prep with the previous step's device execution (JAX
dispatch is async). cv2/PIL release the GIL during decode/resize, so
threads parallelize the actual work without multiprocess plumbing.
"""

from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    """Iterates a dataset in shuffled batches with worker threads.

    Yields collated numpy batch dicts indefinitely (epoch wrap-around),
    mirroring the reference's re-initialized iterator behavior
    (train.py:159-162). Deterministic given `seed`.
    """

    def __init__(self, dataset, batch_size, shuffle=True, num_workers=4,
                 prefetch=4, seed=0, drop_last=True):
        import numpy as np
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._np = np
        self._rng = np.random.default_rng(seed)
        self._queue = queue.Queue(maxsize=prefetch)
        self._index_queue = queue.Queue()
        self._stop = threading.Event()
        self._threads = []
        self._epoch = 0
        self._fill_indices()
        for _ in range(self.num_workers):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)

    def _fill_indices(self):
        n = len(self.dataset)
        order = (self._rng.permutation(n) if self.shuffle
                 else self._np.arange(n))
        nb = n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)
        if nb == 0:
            # Without this, workers would wait for indices and the
            # consumer for batches — a silent deadlock.
            raise ValueError(
                f'dataset has {n} images but one batch needs '
                f'{self.batch_size} (global batch = train.batch_size x '
                f'device count): not enough data for a single step')
        for i in range(nb):
            self._index_queue.put(order[i * self.batch_size:
                                        (i + 1) * self.batch_size])
        self._epoch += 1

    def _worker(self):
        while not self._stop.is_set():
            try:
                idxs = self._index_queue.get(timeout=0.1)
            except queue.Empty:
                continue
            try:
                items = [self.dataset[int(i)] for i in idxs]
                batch = self.dataset.collate(items)
                self._queue.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                self._queue.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        if self._index_queue.qsize() < self.num_workers:
            self._fill_indices()
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
