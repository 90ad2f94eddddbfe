"""run.sh orchestration smoke over all three tasks (synthetic, capped).

Guards VERDICT r2 weak #2: for --task multiclass, stage 1 must compare
{ce, focal} — not {bce, lovasz_hinge}, which train.py lowers to identical
CE runs that the tables would then mislabel as different losses.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMOKE = [
    "--data-path", "synthetic:16", "--model", "unet_plain",
    "--epochs", "1", "--batch-size", "8", "--input-size", "32",
    "--workers", "0", "--max-batches", "2", "--seed", "5",
]


def _run(tmp_path, extra):
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    res = subprocess.run(
        ["bash", os.path.join(REPO, "run.sh")] + SMOKE + extra,
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    return res.stdout


def _exp_configs(tmp_path):
    out = []
    for c in sorted(glob.glob(str(tmp_path / "run/train/exp*/config.json"))):
        with open(c) as f:
            out.append(json.load(f))
    return out


@pytest.mark.slow
def test_run_sh_multiclass_stage1_compares_ce_vs_focal(tmp_path):
    out = _run(tmp_path, ["--task", "multiclass", "--max-stage", "1"])
    cfgs = _exp_configs(tmp_path)
    assert sorted(c["loss"] for c in cfgs) == ["ce", "focal"]
    assert all(c["task"] == "multiclass" for c in cfgs)
    assert "ce=" in out and "focal=" in out
    # tables rendered for the multiclass task
    assert glob.glob(str(tmp_path / "run/tables/*.csv"))


@pytest.mark.slow
def test_run_sh_binary_stage1(tmp_path):
    _run(tmp_path, ["--task", "binary", "--max-stage", "1"])
    cfgs = _exp_configs(tmp_path)
    assert sorted(c["loss"] for c in cfgs) == ["bce", "lovasz_hinge"]
    # Binary BCE resolves pos_weight 'auto' from the train split; the
    # RESOLVED value must be recorded in config.json (round-5: it's what
    # val.py --pos-weight needs to reproduce the training loss scale).
    bce = next(c for c in cfgs if c["loss"] == "bce")
    assert bce["resolved_pos_weight"] > 0
    lov = next(c for c in cfgs if c["loss"] == "lovasz_hinge")
    assert "resolved_pos_weight" not in lov  # pos_weight is BCE-only


@pytest.mark.slow
def test_run_sh_multitask_single_run(tmp_path):
    # The --model unet_plain in SMOKE must be ignored (warned about) for the
    # multitask leg: only multitask_unet has the two heads the task needs.
    out = _run(tmp_path, ["--task", "multitask"])
    assert "ignored for --task multitask" in out
    cfgs = _exp_configs(tmp_path)
    assert len(cfgs) == 1 and cfgs[0]["task"] == "multitask"
    assert cfgs[0]["model"] == "multitask_unet"
    with open(glob.glob(str(tmp_path / "run/train/exp*/summary.json"))[0]) as f:
        assert "best_score" in json.load(f)


def test_amp_default_resolution():
    """bf16 is the default compute dtype for every config (the round-3 f32
    flip for resnet50+lovasz was reverted by the round-4 matched-init
    study, PARITY.md); an explicit --amp / --no-amp always wins."""
    sys.path.insert(0, REPO)
    import train as train_cli

    assert train_cli.resolve_amp_default("unet_resnet50", "lovasz_hinge") is True
    assert train_cli.resolve_amp_default("unet_resnet50", "bce") is True
    assert train_cli.resolve_amp_default("unet_plain", "lovasz_hinge") is True
    # the CLI flag is tri-state: None means "apply the rule"
    assert train_cli.parse_args([]).amp is None
    assert train_cli.parse_args(["--amp"]).amp is True
    assert train_cli.parse_args(["--no-amp"]).amp is False


def test_train_refuses_task_model_mismatch(tmp_path):
    """train.py fails fast (clear message, no training) on task/model
    mismatches the reference only surfaces as an unpack crash mid-epoch
    (/root/reference/train.py:244)."""
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    for task, model in (("multitask", "unet_plain"), ("binary", "multitask_unet")):
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--task", task, "--model", model,
             "--data-path", "synthetic:8", "--epochs", "1"],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
        )
        assert res.returncode != 0
        assert "incompatible" in res.stderr
