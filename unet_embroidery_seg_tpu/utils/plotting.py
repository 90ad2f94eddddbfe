"""Training-curve plots (parity: /root/reference/utils/plot_results.py).

Writes ``loss_curve.png`` and ``metrics_curve.png`` (dpi=300) into the
weights folder, with the same metric-key priority list covering binary and
multiclass metric sets, serif fonts, and a project-local MPLCONFIGDIR.
"""

from __future__ import annotations

import logging
import os

os.environ.setdefault("MPLCONFIGDIR", ".mpl-cache")
os.makedirs(os.environ["MPLCONFIGDIR"], exist_ok=True)

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib import rcParams

rcParams["font.family"] = "serif"
rcParams["font.serif"] = ["Times New Roman", "Times", "DejaVu Serif", "Liberation Serif"]
logging.getLogger("matplotlib.font_manager").setLevel(logging.ERROR)

METRIC_KEYS_PRIORITY = [
    "Dice",
    "IoU",
    "Precision",
    "Recall",
    "Accuracy",
    "Pixel Accuracy",
    "Mean Accuracy",
    "Mean IoU",
    "Frequency Weighted IoU",
]


def plot_training_curves(train_losses, val_losses, val_metrics_history, weights_folder):
    epochs = range(1, len(train_losses) + 1)

    def _series(key):
        return [float(m.get(key, 0.0)) for m in val_metrics_history]

    metric_keys = [
        k
        for k in METRIC_KEYS_PRIORITY
        if val_metrics_history and k in val_metrics_history[0]
    ]

    plt.figure(figsize=(8, 6))
    plt.plot(epochs, train_losses, label="Train Loss", linewidth=2)
    plt.plot(epochs, val_losses, label="Val Loss", linewidth=2)
    plt.xlabel("Epoch", fontsize=14)
    plt.ylabel("Loss", fontsize=14)
    plt.xticks(fontsize=12)
    plt.yticks(fontsize=12)
    plt.grid(True, which="both", linestyle="--", alpha=0.5)
    plt.legend(fontsize=12)
    plt.tight_layout()
    plt.savefig(os.path.join(weights_folder, "loss_curve.png"), dpi=300)
    plt.close()

    plt.figure(figsize=(8, 6))
    for k in metric_keys:
        plt.plot(epochs, _series(k), label=k, linewidth=2)
    plt.xlabel("Epoch", fontsize=14)
    plt.ylabel("Score", fontsize=14)
    plt.xticks(fontsize=12)
    plt.yticks(fontsize=12)
    plt.grid(True, which="both", linestyle="--", alpha=0.5)
    plt.legend(fontsize=12)
    plt.tight_layout()
    plt.savefig(os.path.join(weights_folder, "metrics_curve.png"), dpi=300)
    plt.close()
