"""Multi-worker batching + device prefetch.

The reference's real throughput machinery is torch DataLoader worker
*processes* with ``pin_memory`` and ``prefetch_factor=10``
(``src/train.py:27-32``). The TPU equivalent: a thread pool running the
cv2/numpy synthesis (cv2 releases the GIL in its hot loops), a bounded batch
queue, and a double-buffered ``jax.device_put`` so the host→HBM copy of batch
N+1 overlaps device compute of batch N.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class BatchLoader:
    """Background-threaded batcher over an indexable dataset.

    ``dataset[idx]`` must return a dict of numpy arrays; batches are stacked
    along a new leading dim. Infinite by default (epochs wrap), matching how
    the synthetic stream is consumed.
    """

    def __init__(self, dataset, batch_size: int, num_workers: int = 6,
                 shuffle: bool = True, seed: Optional[int] = None,
                 queue_depth: int = 10, max_batches: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.max_batches = max_batches
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._stop = threading.Event()
        self._threads = []
        self._started = False

    # ------------------------------------------------------------------

    def _index_stream(self):
        n = len(self.dataset)
        while True:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            yield from order

    def _producer(self, index_q: queue.Queue):
        while not self._stop.is_set():
            try:
                idxs = index_q.get(timeout=0.2)
            except queue.Empty:
                continue
            if idxs is None:
                return
            items = [self.dataset[int(i)] for i in idxs]
            batch = {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def _feeder(self, index_q: queue.Queue):
        stream = self._index_stream()
        produced = 0
        while not self._stop.is_set():
            if self.max_batches is not None and produced >= self.max_batches:
                for _ in self._threads:
                    index_q.put(None)
                return
            idxs = [next(stream) for _ in range(self.batch_size)]
            while not self._stop.is_set():
                try:
                    index_q.put(idxs, timeout=0.2)
                    produced += 1
                    break
                except queue.Full:
                    continue

    def _start(self):
        index_q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        self._threads = [
            threading.Thread(target=self._producer, args=(index_q,), daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in self._threads:
            t.start()
        self._feed_thread = threading.Thread(target=self._feeder,
                                             args=(index_q,), daemon=True)
        self._feed_thread.start()
        self._started = True

    # ------------------------------------------------------------------

    def __iter__(self) -> Iterator[dict]:
        if not self._started:
            self._start()
        served = 0
        while self.max_batches is None or served < self.max_batches:
            yield self._q.get()
            served += 1

    def stop(self):
        self._stop.set()


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Keep ``size`` batches in flight on device (double buffering).

    ``jax.device_put`` is async: the host→HBM copy of the lookahead batches
    overlaps the consumer's device compute.
    """
    import collections

    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
