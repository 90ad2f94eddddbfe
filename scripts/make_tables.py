"""Paper-table CSVs from run/train experiment folders.

Behavior contract (checked by tests/test_make_tables.py, mirroring what the
reference pipeline consumes — /root/reference/scripts/make_tables.py):

  table_3_1_loss_compare.csv   best run per loss on the loss-compare model
  table_3_2_model_compare.csv  best run per model at the winning loss
  table_4_2_ablation.csv       loss x attention (unet_plain vs attention_unet)
  all_runs.csv                 every matching run, for debugging

"Best" always means highest TEST IoU within the candidate group; the
table 3-2 loss defaults to whichever loss won table 3-1.
"""

from __future__ import annotations

import argparse
import csv
import json
from dataclasses import dataclass, field
from pathlib import Path

# Task-dependent: binary runs report confusion-derived metrics keyed on
# IoU; multiclass runs report the PA/MPA/mIoU/FWIoU family keyed on
# "Mean IoU" (ops/metrics.py:147-152).
METRICS_BY_TASK = {
    "binary": ("Dice", "IoU", "Precision", "Recall", "Accuracy"),
    "multiclass": ("Pixel Accuracy", "Mean Accuracy", "Mean IoU",
                   "Frequency Weighted IoU"),
}
BEST_KEY_BY_TASK = {"binary": "IoU", "multiclass": "Mean IoU"}
DEFAULT_LOSSES_BY_TASK = {"binary": "bce,lovasz_hinge", "multiclass": "ce,focal"}

# Set by main() from --task; module-level so Run stays a plain dataclass.
METRICS = METRICS_BY_TASK["binary"]
BEST_KEY = BEST_KEY_BY_TASK["binary"]


@dataclass
class Run:
    """One run/train/expN experiment, as the tables see it."""

    name: str
    config: dict
    summary: dict
    test: dict = field(default_factory=dict)

    @property
    def model(self) -> str | None:
        return self.config.get("model")

    @property
    def loss(self) -> str | None:
        return self.config.get("loss")

    def test_iou(self) -> float:
        v = self.test.get(BEST_KEY)
        return float(v) if v is not None else float("-inf")

    def metric_cells(self) -> dict:
        return {k: self.test.get(k) for k in METRICS}


def load_runs(runs_dir: Path) -> list[Run]:
    out = []
    for exp in sorted(runs_dir.glob("exp*")):
        try:
            config = json.loads((exp / "config.json").read_text(encoding="utf-8"))
            summary = json.loads((exp / "summary.json").read_text(encoding="utf-8"))
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        test = summary.get("test_metrics")
        if test is None:
            tm = exp / "test_metrics.json"
            test = json.loads(tm.read_text(encoding="utf-8")) if tm.exists() else {}
        out.append(Run(exp.name, config, summary, test or {}))
    return out


def best(runs: list[Run]) -> Run | None:
    scored = [r for r in runs if r.test.get(BEST_KEY) is not None]
    return max(scored, key=Run.test_iou) if scored else None


def emit(path: Path, header: list[str], rows: list[dict]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=header)
        w.writeheader()
        w.writerows(rows)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Generate paper-style result tables")
    p.add_argument("--runs-dir", default="run/train")
    p.add_argument("--output-dir", default="run/tables")
    p.add_argument("--data-config", default="no-ai", choices=["no-ai", "full", "sam3"])
    p.add_argument("--task", default="binary", choices=["binary", "multiclass"])
    p.add_argument("--loss-compare-model", default="unet_resnet50")
    p.add_argument("--losses", default="",
                   help="comma list (default: the task's loss pair)")
    p.add_argument("--models",
                   default="unet_plain,unet_resnet50,attention_unet,dualdense_unet")
    p.add_argument("--model-compare-loss", default="")
    args = p.parse_args(argv)

    global METRICS, BEST_KEY
    METRICS = METRICS_BY_TASK[args.task]
    BEST_KEY = BEST_KEY_BY_TASK[args.task]
    if not args.losses:
        args.losses = DEFAULT_LOSSES_BY_TASK[args.task]

    out_dir = Path(args.output_dir)
    losses = [x for x in args.losses.split(",") if x]
    models = [x for x in args.models.split(",") if x]

    pool = [
        r for r in load_runs(Path(args.runs_dir))
        if r.config.get("data_config") == args.data_config
        and r.config.get("task") == args.task
    ]

    # --- 3-1: loss compare on the fixed model ---
    loss_pool = [r for r in pool if r.model == args.loss_compare_model]
    winners31 = {
        name: best([r for r in loss_pool if r.loss == name]) for name in losses
    }
    emit(
        out_dir / "table_3_1_loss_compare.csv",
        ["Loss", "exp", *METRICS],
        [
            {"Loss": name, "exp": r.name, **r.metric_cells()}
            for name, r in winners31.items()
            if r is not None
        ],
    )

    # --- 3-2: model compare at the winning loss ---
    chosen_loss = args.model_compare_loss.strip()
    if not chosen_loss:
        overall = best([r for r in winners31.values() if r is not None])
        chosen_loss = overall.loss if overall else (losses[0] if losses else "")
    emit(
        out_dir / "table_3_2_model_compare.csv",
        ["Model", "Loss", "exp", *METRICS],
        [
            {"Model": m, "Loss": chosen_loss, "exp": r.name, **r.metric_cells()}
            for m in models
            if (r := best([x for x in pool if x.model == m and x.loss == chosen_loss]))
        ],
    )

    # --- 4-2: ablation of attention gating across both losses ---
    ablation_rows = []
    for loss_name in (losses or ["bce", "lovasz_hinge"]):
        for model_name, gated in (("unet_plain", "no"), ("attention_unet", "yes")):
            r = best([x for x in pool if x.model == model_name and x.loss == loss_name])
            if r is not None:
                ablation_rows.append(
                    {"Loss": loss_name, "Attention": gated, "Model": model_name,
                     "exp": r.name, **r.metric_cells()}
                )
    emit(
        out_dir / "table_4_2_ablation.csv",
        ["Loss", "Attention", "Model", "exp", *METRICS],
        ablation_rows,
    )

    # --- debug dump of every matching run ---
    emit(
        out_dir / "all_runs.csv",
        ["exp", "model", "loss", "data_config", "task", "best_epoch", "best_score",
         *[f"test_{k}" for k in METRICS]],
        [
            {
                "exp": r.name,
                "model": r.model,
                "loss": r.loss,
                "data_config": r.config.get("data_config"),
                "task": r.config.get("task"),
                "best_epoch": r.summary.get("best_epoch"),
                "best_score": r.summary.get("best_score"),
                **{f"test_{k}": r.test.get(k) for k in METRICS},
            }
            for r in pool
        ],
    )
    print(f"[OK] tables written to {out_dir}")


if __name__ == "__main__":
    main()
