"""Structured training logs: ``.log.json`` lines + optional TensorBoard.

Rebuild of the reference's mmcv ``log_config`` hook pair — every reference
experiment directory carries a ``<timestamp>.log.json`` with one JSON
object per log interval (mode/epoch/iter/lr/losses/time/data_time) written
by ``TextLoggerHook``, plus TensorBoard scalars from
``TensorboardLoggerHook`` and the FASA sampling-prob histograms pushed via
``bbox_head.tf_writer`` (``apis/epoch_based_dynamic_runner.py:31-34``).

The JSON stream is consumable by ``iif_tpu.cli.analysis logs`` (same
one-object-per-line schema as the reference's ``analyze_logs.py`` input).
TensorBoard is import-guarded: when ``torch.utils.tensorboard`` is
unavailable the writer degrades to JSON-only.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class TrainLogWriter:
    """Append-only ``.log.json`` writer with optional TensorBoard mirror.

    Only rank 0 should construct one (callers gate on
    ``is_main_process()``); records are flushed per line so a crashed run
    still leaves a readable log.
    """

    def __init__(self, work_dir: str, tensorboard: bool = False,
                 filename: Optional[str] = None):
        os.makedirs(work_dir, exist_ok=True)
        stamp = filename or time.strftime("%Y%m%d_%H%M%S")
        self.path = os.path.join(work_dir, f"{stamp}.log.json")
        self._f = open(self.path, "a")
        self.tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(work_dir, "tf_logs"))
            except Exception:   # torch/tensorboard missing: JSON only
                self.tb = None

    def write_env_header(self, exp_name: str, seed: Optional[int] = None
                         ) -> None:
        """First line of every reference ``.log.json``: the collected
        environment block + experiment name + seed (mmcv TextLoggerHook
        writes the same header; see the env_info block in the reference's
        ``20220825_181618.log.json``). Downstream readers skip it — it
        carries no per-iter ``mode``/``time`` fields."""
        from iif_tpu.utils.env import env_info_str

        rec = {"env_info": env_info_str(), "exp_name": exp_name}
        if seed is not None:
            rec["seed"] = int(seed)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def write(self, record: Dict, step: Optional[int] = None) -> None:
        """One log interval: dumps the record as a JSON line and mirrors
        numeric fields to TensorBoard under ``<mode>/<key>``."""
        rec = {}
        for k, v in record.items():
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            rec[k] = round(v, 5) if isinstance(v, float) else v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.tb is not None and step is not None:
            mode = rec.get("mode", "train")
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k not in (
                        "epoch", "iter", "step"):
                    self.tb.add_scalar(f"{mode}/{k}", v, step)

    def add_histogram(self, tag: str, values, step: int) -> None:
        """TensorBoard histogram (FASA prob_list); summary stats also land
        in the JSON stream so the data survives without TB."""
        values = np.asarray(values)
        self.write({"mode": "val", "tag": tag, "step": int(step),
                    "mean": float(values.mean()), "min": float(values.min()),
                    "max": float(values.max())})
        if self.tb is not None:
            self.tb.add_histogram(tag, values, step)

    def close(self) -> None:
        self._f.close()
        if self.tb is not None:
            self.tb.close()
