"""Training meters — reference ``classification/utils.py:13-179``.

``SmoothedValue`` keeps a window median/avg plus global totals;
``synchronize_between_processes`` is the cross-host sum of (count, total)
(reference does a NCCL ``all_reduce``, ``utils.py:31-43``; here the sync is
a tiny jnp psum-free host allgather via ``jax.experimental.multihost_utils``
when running multi-process, identity otherwise — on-device metric math stays
inside the jitted step, so this touches only two scalars per meter).
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _global_sum(values: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return values
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(jnp.asarray(values))).sum(axis=0)


class SmoothedValue:
    """Windowed meter with global average (``utils.py:13-66``)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self) -> None:
        t = _global_sum(np.array([self.count, self.total], dtype=np.float64))
        self.count = int(t[0])
        self.total = float(t[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value)


class MetricLogger:
    """Iteration logger with ETA (``utils.py:69-162``)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print = print_fn

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                v = float(v)
            self.meters[k].update(float(v))

    def __getattr__(self, attr: str) -> SmoothedValue:
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def add_meter(self, name: str, meter: SmoothedValue) -> None:
        self.meters[name] = meter

    def synchronize_between_processes(self) -> None:
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: Optional[str] = None, total: Optional[int] = None,
                  sink=None):
        """``sink``: optional callable receiving, at every print point, a
        dict of {iter, time, data_time, <meter medians>} — the hook the
        ``.log.json`` writer rides (mmcv TextLoggerHook equivalent)."""
        header = header or ""
        if total is None:
            try:
                total = len(iterable)  # type: ignore[arg-type]
            except TypeError:
                total = 0
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and (i % print_freq == 0 or i == total - 1):
                eta = datetime.timedelta(
                    seconds=int(iter_time.global_avg * max(total - i, 0)))
                self.print(self.delimiter.join([
                    header, f"[{i}/{total}]", f"eta: {eta}", str(self),
                    f"time: {iter_time}", f"data: {data_time}"]))
                if sink is not None:
                    sink({"iter": i, "time": iter_time.avg,
                          "data_time": data_time.avg,
                          **{k: m.median for k, m in self.meters.items()}})
            i += 1
            end = time.time()
        elapsed = time.time() - start
        self.print(f"{header} Total time: "
                   f"{datetime.timedelta(seconds=int(elapsed))}")


def accuracy_topk(logits: jnp.ndarray, targets: jnp.ndarray,
                  topk=(1,)) -> list:
    """Top-k accuracy percentages (``utils.py:165-179``), jit-friendly."""
    maxk = max(topk)
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == targets[:, None]
    res = []
    for k in topk:
        acc = correct[:, :k].any(axis=1).mean() * 100.0
        res.append(acc)
    return res
