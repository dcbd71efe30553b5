"""Host-side batch prefetching — the TPU-native replacement for the
reference's 8-worker torch DataLoader (train_data.py:208-239).

A background thread assembles (batch, targets) pairs ahead of the training
loop and pushes them to device, so host-side gather/IO overlaps the jitted
step. Per-worker R-sequence offsets (datasets.py:375-379
``worker_offset_sequence``) are preserved: each producer thread starts its
pixel sequence at ``(h*w / num_workers) * worker_id``.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


class BatchPrefetcher:
    """Producer thread(s) building batches ahead of consumption."""

    def __init__(self, make_batch: Callable[[np.ndarray], tuple],
                 image_index_iter: Iterator[np.ndarray],
                 depth: int = 2):
        self._make_batch = make_batch
        self._indices = image_index_iter
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for idx in self._indices:
                if self._stop.is_set():
                    return
                self._q.put(self._make_batch(idx))
        finally:
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


def epoch_image_indices(n_images: int, batch_images: int, n_epochs: int,
                        seed: int = 0) -> Iterator[np.ndarray]:
    """Shuffled image-index batches, reshuffling each pass (the DataLoader
    shuffle=True semantics)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_images)
    cursor = 0
    for _ in range(n_epochs):
        if cursor + batch_images > n_images:
            perm = rng.permutation(n_images)
            cursor = 0
        yield perm[cursor:cursor + batch_images]
        cursor += batch_images


def worker_offset(h: int, w: int, num_workers: int, worker_id: int) -> int:
    """Per-worker R-sequence start offset (datasets.py:375-379)."""
    return int((h * w / num_workers) * worker_id)
