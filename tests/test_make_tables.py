"""make_tables.py: CSV generation from synthetic experiment folders.

Pins the grouping/selection semantics the reference pipeline depends on
(best run per group by TEST IoU, auto best-loss pick for table 3-2 —
/root/reference/scripts/make_tables.py:43-53,113-117).
"""

import csv
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import make_tables  # noqa: E402


def _fake_run(runs_dir, name, model, loss, test_iou, data_config="no-ai", task="binary"):
    d = runs_dir / name
    d.mkdir(parents=True)
    config = {"model": model, "loss": loss, "data_config": data_config, "task": task}
    metrics = {"Dice": test_iou + 0.1, "IoU": test_iou, "Precision": 0.5,
               "Recall": 0.5, "Accuracy": 0.9}
    (d / "config.json").write_text(json.dumps(config))
    (d / "summary.json").write_text(json.dumps({
        "best_score": test_iou - 0.02, "test_metrics": metrics,
        "best_val_metrics": metrics,
    }))


@pytest.fixture
def runs(tmp_path):
    runs_dir = tmp_path / "run" / "train"
    _fake_run(runs_dir, "exp", "unet_resnet50", "bce", 0.60)
    _fake_run(runs_dir, "exp1", "unet_resnet50", "lovasz_hinge", 0.70)
    _fake_run(runs_dir, "exp2", "unet_resnet50", "lovasz_hinge", 0.65)  # worse dup
    _fake_run(runs_dir, "exp3", "unet_plain", "lovasz_hinge", 0.55)
    _fake_run(runs_dir, "exp4", "attention_unet", "lovasz_hinge", 0.66)
    _fake_run(runs_dir, "exp5", "dualdense_unet", "lovasz_hinge", 0.62)
    _fake_run(runs_dir, "exp6", "unet_plain", "bce", 0.50)
    _fake_run(runs_dir, "exp7", "attention_unet", "bce", 0.61)
    _fake_run(runs_dir, "exp8", "unet_plain", "bce", 0.40, data_config="full")  # filtered out
    return tmp_path


def _read_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


class TestMakeTables:
    def test_tables_generated(self, runs):
        out = runs / "run" / "tables"
        make_tables.main([
            "--runs-dir", str(runs / "run" / "train"),
            "--output-dir", str(out),
            "--data-config", "no-ai",
        ])
        for f in ("table_3_1_loss_compare.csv", "table_3_2_model_compare.csv",
                  "table_4_2_ablation.csv", "all_runs.csv"):
            assert (out / f).exists(), f

    def test_loss_compare_picks_best_run_per_loss(self, runs):
        out = runs / "run" / "tables"
        make_tables.main([
            "--runs-dir", str(runs / "run" / "train"),
            "--output-dir", str(out),
            "--data-config", "no-ai",
        ])
        rows = _read_csv(out / "table_3_1_loss_compare.csv")
        by_loss = {r["Loss"]: r for r in rows}
        # the 0.70 lovasz run must win over the 0.65 duplicate
        assert float(by_loss["lovasz_hinge"]["IoU"]) == pytest.approx(0.70)
        assert float(by_loss["bce"]["IoU"]) == pytest.approx(0.60)

    def test_model_compare_uses_best_loss(self, runs):
        out = runs / "run" / "tables"
        make_tables.main([
            "--runs-dir", str(runs / "run" / "train"),
            "--output-dir", str(out),
            "--data-config", "no-ai",
        ])
        rows = _read_csv(out / "table_3_2_model_compare.csv")
        assert len(rows) == 4  # the four compare models
        for r in rows:
            assert r["Loss"] == "lovasz_hinge"  # auto-picked winner of 3-1

    def test_data_config_filter(self, runs):
        out = runs / "run" / "tables"
        make_tables.main([
            "--runs-dir", str(runs / "run" / "train"),
            "--output-dir", str(out),
            "--data-config", "no-ai",
        ])
        rows = _read_csv(out / "all_runs.csv")
        assert all(r["data_config"] == "no-ai" for r in rows)
        assert len(rows) == 8
