"""parity_study.resolve_run_exp: attributing a finished leg to its exp dir.

mtime-newest resolution silently mis-attributed metrics when anything else
created run/train/exp* dirs while a leg ran (observed in round 3: a verify
train during a multi-hour CPU parity leg). The fix matches config.json
(model, loss, seed) against the pre-launch snapshot; these tests pin it.
"""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
from parity_study import ensure_regime, exp_dirs, resolve_run_exp  # noqa: E402


def _mk_exp(root, name, model, loss, seed):
    d = os.path.join(root, "run", "train", name)
    os.makedirs(d)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model": model, "loss": loss, "seed": seed}, f)
    return d


def test_picks_the_new_matching_dir_not_the_newest(tmp_path):
    root = str(tmp_path)
    _mk_exp(root, "exp", "unet_resnet50", "lovasz_hinge", 1)  # stale, same cfg
    before = exp_dirs(root)
    ours = _mk_exp(root, "exp1", "unet_resnet50", "lovasz_hinge", 1)
    time.sleep(0.01)
    # A concurrent unrelated run lands AFTER ours — newest by mtime.
    _mk_exp(root, "exp2", "unet_plain", "bce", 11)
    got = resolve_run_exp(root, before, "unet_resnet50", "lovasz_hinge", 1)
    assert got == ours


def test_falls_back_to_any_matching_dir_when_none_is_new(tmp_path):
    # A recreated folder can predate the snapshot (round-3 rescue): the
    # fallback must still find it by config, never return a non-match.
    root = str(tmp_path)
    ours = _mk_exp(root, "exp26", "unet_resnet50", "lovasz_hinge", 1)
    time.sleep(0.01)
    _mk_exp(root, "exp27", "unet_plain", "bce", 11)  # newer, wrong config
    before = exp_dirs(root)  # snapshot taken AFTER both exist
    got = resolve_run_exp(root, before, "unet_resnet50", "lovasz_hinge", 1)
    assert got == ours


def test_newest_wins_among_multiple_matches(tmp_path):
    root = str(tmp_path)
    before = exp_dirs(root)
    _mk_exp(root, "exp", "unet_plain", "bce", 0)
    time.sleep(0.01)
    newer = _mk_exp(root, "exp1", "unet_plain", "bce", 0)
    got = resolve_run_exp(root, before, "unet_plain", "bce", 0)
    assert got == newer


def test_raises_when_nothing_matches(tmp_path):
    root = str(tmp_path)
    _mk_exp(root, "exp", "unet_plain", "bce", 0)
    with pytest.raises(RuntimeError, match="seed=3"):
        resolve_run_exp(root, set(), "unet_plain", "bce", 3)


def test_regime_match_preserves_recorded_seeds():
    results = {"plain_bce/ref": {
        "epochs": 15, "input_size": 128, "amp": False, "platform": "cpu",
        "by_seed": {"0": {"IoU": 0.5}},
    }}
    entry = ensure_regime(results, "plain_bce/ref", 15, 128, False, "cpu")
    assert entry["by_seed"] == {"0": {"IoU": 0.5}}
    assert set(results) == {"plain_bce/ref"}


def test_regime_change_archives_instead_of_destroying():
    # Multi-hour legs must survive a mid-study default flip (e.g.
    # resolve_amp_default moving resnet50+lovasz to f32): the old regime is
    # archived under a tagged key, and the live entry restarts empty.
    old_seeds = {"0": {"IoU": 0.24}, "1": {"IoU": 0.26}}
    results = {"resnet_lovasz/ours": {
        "epochs": 15, "input_size": 128, "amp": True, "platform": "tpu",
        "by_seed": dict(old_seeds),
    }}
    entry = ensure_regime(results, "resnet_lovasz/ours", 15, 128, False, "tpu")
    assert "by_seed" not in entry  # fresh regime starts empty
    assert entry["amp"] is False
    archived = results["resnet_lovasz/ours@e15_i128_ampTrue_tpu_parity_ds"]
    assert archived["by_seed"] == old_seeds


def test_dataset_change_archives_previous_regime():
    # The scaled multitask study runs on a larger export (parity_ds_mt);
    # its seeds must never be pooled with the 64-image parity_ds ones.
    results = {"multitask_bce/ours": {
        "epochs": 40, "input_size": 256, "amp": True, "platform": "tpu",
        "by_seed": {"0": {"IoU": 0.0}},
    }}
    entry = ensure_regime(results, "multitask_bce/ours", 40, 256, True,
                          "tpu", data="parity_ds_mt")
    assert "by_seed" not in entry
    assert entry["data"] == "parity_ds_mt"
    archived = results["multitask_bce/ours@e40_i256_ampTrue_tpu_parity_ds"]
    assert archived["by_seed"] == {"0": {"IoU": 0.0}}


def test_fresh_key_initializes_regime():
    results: dict = {}
    entry = ensure_regime(results, "plain_bce/ours", 40, 256, True, "tpu")
    assert entry == {"epochs": 40, "input_size": 256, "amp": True,
                     "platform": "tpu", "data": "parity_ds"}
    assert set(results) == {"plain_bce/ours"}


def test_ignores_dirs_with_unreadable_config(tmp_path):
    root = str(tmp_path)
    bad = os.path.join(root, "run", "train", "exp")
    os.makedirs(bad)
    with open(os.path.join(bad, "config.json"), "w") as f:
        f.write("not json")
    ours = _mk_exp(root, "exp1", "unet_plain", "bce", 0)
    got = resolve_run_exp(root, set(), "unet_plain", "bce", 0)
    assert got == ours
