"""True-resume e2e: interrupted training == uninterrupted training.

The reference cannot do this: its --weights restart reloads model weights
only, losing optimizer moments, the epoch counter, and the LR-schedule
position (/root/reference/train.py:376-383, SURVEY.md §5). Here,
train.py --resume restores the full TrainState + histories, and every RNG
stream is re-derived from (seed, epoch), so a run stopped at epoch K and
resumed must produce bit-identical final weights and metrics.
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from train import parse_args, train  # noqa: E402
from unet_embroidery_seg_tpu.engine import checkpoint  # noqa: E402

BASE_ARGS = [
    "--data-path", "synthetic:8",
    "--model", "unet_plain",
    "--task", "binary",
    "--loss", "bce",
    "--input-size", "32",
    "--batch-size", "4",
    "--no-device-augment",
    "--no-export-vis",
    "--no-amp",
    "--workers", "0",
    "--max-train-batches", "2",
    "--max-val-batches", "2",
    "--max-test-batches", "1",
    "--seed", "3",
    "--mesh-data", "1",  # conftest exposes 8 virtual CPU devices
]


def _params(path):
    return checkpoint.load_payload(path)["params"]


def _assert_tree_equal(a, b):
    import jax

    fa = jax.tree.leaves(a)
    fb = jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_resume_matches_uninterrupted(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    # Uninterrupted: 4 epochs straight.
    exp_a = train(parse_args(BASE_ARGS + ["--epochs", "4", "--ckpt-every", "0"]))

    # Interrupted: 2 epochs with a resume checkpoint, then resume to 4.
    exp_b1 = train(parse_args(BASE_ARGS + ["--epochs", "2", "--ckpt-every", "2"]))
    resume_path = os.path.join(exp_b1, "weights", "resume.msgpack")
    assert os.path.exists(resume_path)
    exp_b2 = train(
        parse_args(
            BASE_ARGS
            + ["--epochs", "4", "--ckpt-every", "0", "--resume", resume_path]
        )
    )

    # Final weights bit-identical to the uninterrupted run.
    _assert_tree_equal(
        _params(os.path.join(exp_a, "weights", "last.msgpack")),
        _params(os.path.join(exp_b2, "weights", "last.msgpack")),
    )

    # Histories and best tracking continue seamlessly.
    with open(os.path.join(exp_a, "summary.json")) as f:
        summary_a = json.load(f)
    with open(os.path.join(exp_b2, "summary.json")) as f:
        summary_b = json.load(f)
    assert summary_a["best_epoch"] == summary_b["best_epoch"]
    assert summary_a["best_score"] == pytest.approx(summary_b["best_score"])
    with open(os.path.join(exp_a, "val_metrics_history.json")) as f:
        hist_a = json.load(f)
    with open(os.path.join(exp_b2, "val_metrics_history.json")) as f:
        hist_b = json.load(f)
    assert len(hist_a) == len(hist_b) == 4
    for ma, mb in zip(hist_a, hist_b):
        for k in ma:
            assert ma[k] == pytest.approx(mb[k], abs=1e-6)


def test_resume_missing_file_raises(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(FileNotFoundError):
        train(
            parse_args(
                BASE_ARGS + ["--epochs", "1", "--resume", "does/not/exist.msgpack"]
            )
        )
