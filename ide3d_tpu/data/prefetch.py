"""Threaded prefetching batch loader over the native host ops.

Replaces the reference's torch DataLoader worker pool
(apps/train_hybrid_encoder.py:221-226): decode happens in Python threads (PIL
releases the GIL during decode) and the hot per-sample transforms (normalize,
one-hot, flip, batch assembly) run in the C++ host_ops extension which also
releases the GIL — so N loader threads genuinely overlap with the TPU step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from . import _native as N


class PrefetchLoader:
    """Infinite prefetching loader: wraps a dataset yielding
    (img_u8 HWC, seg_u8 HW | None, label) raw items.

    Yields dict(img f32 [B,H,W,3] in [-1,1], seg f32 [B,H,W,C] in {-1,1}, c [B,25]).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
        prefetch: int = 4,
        host_id: int = 0,
        num_hosts: int = 1,
        num_classes: int = 19,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_classes = num_classes
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._index_lock = threading.Lock()
        self._rng = np.random.RandomState(seed)
        n = len(dataset)
        self._order = np.arange(host_id, n, num_hosts)
        self._rng.shuffle(self._order)
        self._pos = 0
        self._threads = [
            threading.Thread(target=self._worker, daemon=True) for _ in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    def _next_indices(self) -> np.ndarray:
        with self._index_lock:
            out = []
            for _ in range(self.batch_size):
                if self._pos >= len(self._order):
                    self._rng.shuffle(self._order)
                    self._pos = 0
                out.append(int(self._order[self._pos]))
                self._pos += 1
            return np.asarray(out)

    def _worker(self):
        while not self._stop.is_set():
            idx = self._next_indices()
            imgs, segs, labels, flips = [], [], [], []
            for i in idx:
                if hasattr(self.dataset, "raw_item"):
                    img, seg, label, flip = self.dataset.raw_item(i)
                else:
                    item = self.dataset[i]
                    if len(item) == 3:
                        img, seg, label = item
                    else:
                        (img, label), seg = item, None
                    flip = False
                imgs.append(np.ascontiguousarray(img))
                if seg is not None:
                    # accept one-hot float (legacy path) or raw int masks
                    if seg.ndim == 3:
                        seg = np.argmax(seg, axis=-1).astype(np.uint8)
                    segs.append(np.ascontiguousarray(seg))
                labels.append(label)
                flips.append(int(flip))
            img_b, seg_b = N.batch_assemble(
                imgs, segs if segs else None, flips, self.num_classes
            )
            batch = {"img": img_b, "c": np.stack(labels).astype(np.float32)}
            if seg_b is not None:
                batch["seg"] = seg_b
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        return self._q.get()

    def close(self):
        self._stop.set()
        for t in self._threads:
            t.join(timeout=1.0)
