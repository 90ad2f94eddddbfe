"""--defer-ckpt e2e: deferred best/last writes == per-epoch writes.

The reference writes best.pth/last.pth every epoch
(/root/reference/train.py:376-383) and so does train.py by default.
--defer-ckpt keeps the best master tree as an on-device copy and performs
the host fetch + disk write once after the loop (for hosts with a slow
device link, where per-epoch 100MB+ param fetches dominate small-dataset
epochs).  The artifacts must be bit-identical either way: the deferred
copy is taken from the same f32 master tree at the same epoch.
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
    # AMP stays ON: the deferred copy must come from the f32 masters that
    # TreeAdam keeps in opt_state, not the bf16 compute params.
    "--workers", "0",
    "--max-train-batches", "2",
    "--max-val-batches", "2",
    "--max-test-batches", "1",
    "--epochs", "2",
    "--ckpt-every", "0",
    "--seed", "5",
    "--mesh-data", "1",
]


def _payload(exp, name):
    return checkpoint.load_payload(os.path.join(exp, "weights", name))


def _assert_payload_equal(a, b):
    import jax

    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_defer_ckpt_bit_identical(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    exp_eager = train(parse_args(BASE_ARGS))
    exp_defer = train(parse_args(BASE_ARGS + ["--defer-ckpt"]))

    for name in ("best.msgpack", "last.msgpack"):
        pa, pb = _payload(exp_eager, name), _payload(exp_defer, name)
        # f32 masters, not bf16 compute copies (reference best.pth is f32).
        assert all(
            np.asarray(leaf).dtype == np.float32
            for leaf in __import__("jax").tree.leaves(pb["params"])
        )
        _assert_payload_equal(pa, pb)

    with open(os.path.join(exp_eager, "summary.json")) as f:
        sa = json.load(f)
    with open(os.path.join(exp_defer, "summary.json")) as f:
        sb = json.load(f)
    assert sa["best_epoch"] == sb["best_epoch"]
    assert sa["best_score"] == sb["best_score"]
