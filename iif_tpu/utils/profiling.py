"""Tracing / profiling utilities.

TPU-native replacement for the reference's profiling helpers
(``mmdet/utils/profiling.py:11-40`` `profile_time` pairing CPU clocks with
CUDA events; throughput meters in every log line; offline
``tools/analysis_tools/benchmark.py``): here a `profile_time` context
manager that blocks on device work (the honest TPU analogue of CUDA event
sync), a `trace` wrapper around ``jax.profiler`` emitting TensorBoard/
Perfetto traces, and step-time statistics helpers.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile_time(name: str, *, sync: bool = True, enabled: bool = True,
                 print_fn=print) -> Iterator[None]:
    """Wall-time a block; with ``sync`` waits for all device work first and
    after (the TPU analogue of cudaEventSynchronize)."""
    if not enabled:
        yield
        return
    if sync:
        jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            jax.effects_barrier()
        print_fn(f"{name} elapsed_time: {time.perf_counter() - t0:.6f} s")


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``jax.profiler.TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step host-time meter producing the reference log-line fields
    (time / data_time) and an images/sec summary."""

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self.times: List[float] = []
        self.data_times: List[float] = []
        self._t_end: Optional[float] = None

    def data_ready(self) -> None:
        now = time.perf_counter()
        if self._t_end is not None:
            self.data_times.append(now - self._t_end)

    def step_done(self) -> None:
        now = time.perf_counter()
        if self._t_end is not None:
            self.times.append(now - self._t_end)
        self._t_end = now

    def summary(self, batch_size: int) -> Dict[str, float]:
        t = np.asarray(self.times[self.warmup:] or self.times or [0.0])
        d = np.asarray(self.data_times[self.warmup:]
                       or self.data_times or [0.0])
        return {
            "time_mean_s": float(t.mean()),
            "time_p50_s": float(np.median(t)),
            "data_time_mean_s": float(d.mean()),
            "images_per_sec": float(batch_size / max(t.mean(), 1e-9)),
        }


def flops_of(fn, *args, **kwargs) -> Optional[float]:
    """Analytical FLOPs of a jitted function via XLA's cost analysis
    (replacement for ``tools/analysis_tools/get_flops.py``)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0] if analysis else {}
    return float(analysis.get("flops", float("nan"))) if analysis else None


def analyze_log_json(path: str, key: str = "time") -> Dict[str, float]:
    """Train-speed statistics from a .log.json-style file (one JSON object
    per line with per-iter fields) — ``analyze_logs.py`` equivalent."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if key in rec:
                vals.append(float(rec[key]))
    arr = np.asarray(vals or [0.0])
    return {"mean": float(arr.mean()), "std": float(arr.std()),
            "median": float(np.median(arr)), "n": len(vals)}


def load_log_json(path: str) -> List[Dict]:
    """All parseable records of a ``.log.json`` file, in file order."""
    recs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            recs.append(rec)
    return recs


def plot_log_curves(paths: List[str], keys: List[str],
                    legend: Optional[List[str]] = None,
                    title: Optional[str] = None,
                    out: Optional[str] = None) -> None:
    """``analyze_logs.py plot_curve`` parity: epoch-indexed marker plots
    for eval metrics (key contains 'AP'/'mAP'/'acc', taken from val-mode
    records) and global-iter line plots for train losses/lr, overlaid
    for any number of log files. Saves to ``out`` or shows interactively.
    """
    import matplotlib

    if out is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if legend is None:
        legend = [f"{p}_{k}" for p in paths for k in keys]
    if len(legend) != len(paths) * len(keys):
        raise ValueError("--legend must have len(paths) * len(keys) "
                         "entries")

    for i, path in enumerate(paths):
        recs = load_log_json(path)
        train = [r for r in recs if r.get("mode", "train") == "train"
                 and "iter" in r]
        vals = [r for r in recs if r.get("mode") == "val"]
        iters_per_epoch = max((r.get("iter", 0) for r in train),
                              default=1)
        for j, key in enumerate(keys):
            label = legend[i * len(keys) + j]
            is_eval = any(t in key for t in ("AP", "mAP", "acc"))
            src = vals if is_eval else train
            xs, ys = [], []
            for r in src:
                if key not in r:
                    continue
                if is_eval:
                    xs.append(r.get("epoch", len(xs) + 1))
                else:
                    xs.append((r.get("epoch", 1) - 1) * iters_per_epoch
                              + r.get("iter", 0))
                ys.append(float(r[key]))
            if not xs:
                raise KeyError(f"{path} has no records with key "
                               f"'{key}'")
            if is_eval:
                plt.plot(xs, ys, label=label, marker="o")
                plt.xlabel("epoch")
            else:
                plt.plot(xs, ys, label=label, linewidth=0.8)
                plt.xlabel("iter")
    plt.legend()
    if title:
        plt.title(title)
    if out is None:
        plt.show()
    else:
        plt.savefig(out)
        plt.cla()
        print(f"saved curve to: {out}")
