"""Host-side batcher feeding the device mesh.

Replaces torch DataLoader + DistributedSampler: the loader materializes raw
uint8 batches (augmentation happens *on device* inside the jitted step —
the ≥2x throughput lever vs the reference's PIL-worker pipeline, see
SURVEY.md §3.1 hot-loop note). Each process yields only its local slice of
the global batch; ``parallel.shard_batch`` assembles the global sharded
array.
"""
from __future__ import annotations

import threading
import queue as _queue
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from iif_tpu.data.samplers import balanced_epoch_order, random_epoch_order
from iif_tpu.parallel.mesh import local_batch_slice


class Loader:
    """Batches an array-backed dataset with per-epoch deterministic order.

    Parameters
    ----------
    data: (N, ...) array or an object with ``load_image(i)`` (lazy decode)
    targets: (N,) int labels
    batch_size: GLOBAL batch size (split across processes)
    sampler: 'random' | 'upsampling' | 'downsampling'
    drop_last: drop the trailing partial batch (train) — eval pads+masks
    prefetch: host-side double buffering depth (decode overlaps device step)
    """

    def __init__(
        self,
        data,
        targets: Sequence[int],
        batch_size: int,
        sampler: str = "random",
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
    ):
        self.data = data
        self.targets = np.asarray(targets, dtype=np.int64)
        self.batch_size = batch_size
        self.sampler = sampler
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _epoch_order(self) -> np.ndarray:
        if self.sampler == "random":
            return random_epoch_order(len(self.targets), self.epoch, self.seed)
        return balanced_epoch_order(self.targets, self.epoch,
                                    mode=self.sampler, seed=self.seed)

    def __len__(self) -> int:
        n = len(self._epoch_order())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _gather(self, idx: np.ndarray) -> np.ndarray:
        if hasattr(self.data, "load_image"):
            return np.stack([self.data.load_image(int(i)) for i in idx])
        return self.data[idx]

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        n_batches = len(self)
        start, per = local_batch_slice(self.batch_size)
        for b in range(n_batches):
            sel = order[b * self.batch_size:(b + 1) * self.batch_size]
            valid = np.ones(len(sel), dtype=bool)
            if len(sel) < self.batch_size:  # non-drop_last tail: pad + mask
                pad = self.batch_size - len(sel)
                sel = np.concatenate([sel, np.full(pad, sel[-1] if len(sel) else 0)])
                valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
            sel_local = sel[start:start + per]
            yield {
                "image": self._gather(sel_local),
                "label": self.targets[sel_local],
                "valid": valid[start:start + per],
            }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: _queue.Queue = _queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def _worker():
            try:
                for b in self._batches():
                    q.put(b)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=_worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item


def eval_batches(data, targets: Sequence[int], batch_size: int
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """Sequential padded+masked eval batches (exact accuracy despite
    fixed XLA shapes — replaces the reference's FIXME about distributed
    padding, ``classification/train.py:108-110``)."""
    targets = np.asarray(targets, dtype=np.int64)
    n = len(targets)
    start, per = local_batch_slice(batch_size)
    for b0 in range(0, n, batch_size):
        sel = np.arange(b0, min(b0 + batch_size, n))
        valid = np.ones(len(sel), dtype=bool)
        if len(sel) < batch_size:
            pad = batch_size - len(sel)
            sel = np.concatenate([sel, np.full(pad, sel[-1])])
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        sel_local, valid_local = sel[start:start + per], valid[start:start + per]
        if hasattr(data, "load_image"):
            imgs = np.stack([data.load_image(int(i)) for i in sel_local])
        else:
            imgs = data[sel_local]
        yield {"image": imgs, "label": targets[sel_local], "valid": valid_local}
