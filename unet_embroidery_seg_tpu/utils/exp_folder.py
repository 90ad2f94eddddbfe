"""Experiment-folder management (parity: /root/reference/utils/create_exp_folder.py).

Training runs land in ``run/train/exp{,1,2,...}`` (first free index) with a
``weights/`` subfolder; predictions in ``run/predict/expN``. The downstream
table generator globs ``run/train/exp*`` (scripts/make_tables.py), so the
layout is contract, not convention.
"""

from __future__ import annotations

import os


def _next_exp_dir(parent: str) -> str:
    os.makedirs(parent, exist_ok=True)
    candidate = os.path.join(parent, "exp")
    if not os.path.exists(candidate):
        return candidate
    n = 1
    while True:
        candidate = os.path.join(parent, f"exp{n}")
        if not os.path.exists(candidate):
            return candidate
        n += 1


def create_exp_folder(root: str = "run") -> tuple[str, str]:
    """Create run/train/expN + weights/; returns (exp_dir, weights_dir)."""
    exp_folder = _next_exp_dir(os.path.join(root, "train"))
    weights_folder = os.path.join(exp_folder, "weights")
    os.makedirs(weights_folder)
    return exp_folder, weights_folder


def create_val_exp_folder(root: str = "run") -> str:
    """Create run/predict/expN (reference skips the bare 'exp' name here
    whenever it already exists — preserved)."""
    exp_folder = _next_exp_dir(os.path.join(root, "predict"))
    os.makedirs(exp_folder)
    return exp_folder
