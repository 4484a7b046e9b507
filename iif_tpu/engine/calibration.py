"""Calibration metrics (ECE/MCE binning) — reference
``classification/reliability_diagrams.py:6-64``.

Pure numpy; the matplotlib reliability-diagram rendering of the reference is
provided by ``plot_reliability_diagram`` (import-guarded so headless
training never pulls matplotlib).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def compute_calibration(true_labels: np.ndarray, pred_labels: np.ndarray,
                        confidences: np.ndarray, num_bins: int = 10
                        ) -> Dict[str, np.ndarray]:
    assert len(confidences) == len(pred_labels) == len(true_labels)
    bin_size = 1.0 / num_bins
    bins = np.linspace(0.0, 1.0, num_bins + 1)
    indices = np.digitize(confidences, bins, right=True)

    bin_accuracies = np.zeros(num_bins)
    bin_confidences = np.zeros(num_bins)
    bin_counts = np.zeros(num_bins, dtype=int)

    for b in range(num_bins):
        selected = np.where(indices == b + 1)[0]
        if len(selected) > 0:
            bin_accuracies[b] = np.mean(
                true_labels[selected] == pred_labels[selected])
            bin_confidences[b] = np.mean(confidences[selected])
            bin_counts[b] = len(selected)

    avg_acc = np.sum(bin_accuracies * bin_counts) / max(np.sum(bin_counts), 1)
    avg_conf = np.sum(bin_confidences * bin_counts) / max(np.sum(bin_counts), 1)
    gaps = np.abs(bin_accuracies - bin_confidences)
    ece = np.sum(gaps * bin_counts) / max(np.sum(bin_counts), 1)
    mce = gaps.max() if len(gaps) else 0.0

    return {
        "accuracies": bin_accuracies,
        "confidences": bin_confidences,
        "counts": bin_counts,
        "bins": bins,
        "avg_accuracy": avg_acc,
        "avg_confidence": avg_conf,
        "expected_calibration_error": ece,
        "max_calibration_error": mce,
    }


def plot_reliability_diagram(true_labels, pred_labels, confidences,
                             num_bins: int = 10, title: str = "Reliability Diagram",
                             out_path: str | None = None):
    """Render the reference's reliability diagram (matplotlib required)."""
    import matplotlib.pyplot as plt

    cal = compute_calibration(true_labels, pred_labels, confidences, num_bins)
    centers = (cal["bins"][:-1] + cal["bins"][1:]) / 2
    widths = np.diff(cal["bins"])
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.bar(centers, cal["accuracies"], width=widths, edgecolor="k",
           alpha=0.7, label="accuracy")
    ax.bar(centers, cal["confidences"] - cal["accuracies"],
           bottom=cal["accuracies"], width=widths, color="r", alpha=0.3,
           label="gap")
    ax.plot([0, 1], [0, 1], "k--")
    ax.set_xlabel("confidence")
    ax.set_ylabel("accuracy")
    ax.set_title(f"{title} (ECE={cal['expected_calibration_error']:.4f})")
    ax.legend()
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    return fig
