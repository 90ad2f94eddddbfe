"""Converged-regime gap diagnostics: single-variable flips of our defaults.

Round-2 found a small resnet50+lovasz defaults gap vs the torch reference
at 128^2/15 epochs, attributed (additively, seed 0) to bf16 compute and the
on-device augmentation twin.  This runs OUR framework's variants in the
CONVERGED regime (256^2/40 epochs, the PARITY_CONVERGED.json setup) so the
attribution — and any default flip — is based on converged evidence, per
the round-2 review.

Variants (flags are explicit so the study stays single-variable even as
CLI defaults move; the train CLI's dtype default for this config flipped
to f32 after the converged study and was reverted to bf16 by the
matched-init study — see train.resolve_amp_default):
  host_aug   : --amp --no-device-augment (PIL/cv2 reference-parity augment)
  f32        : --no-amp                  (f32 compute)
  bf16       : --amp                     (bf16, today's default)
  both       : --no-amp --no-device-augment

Usage:
    python scripts/parity_variants.py --data /tmp/parity_ds \
        [--seeds 0] [--variants host_aug f32 both] [--epochs 40]

Writes PARITY_VARIANTS_CONVERGED.json {variant: {seed: test_metrics}}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_study import exp_dirs, resolve_run_exp  # shared exp-dir resolution

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "host_aug": ["--amp", "--no-device-augment"],
    "f32": ["--no-amp"],
    "bf16": ["--amp"],
    "both": ["--no-amp", "--no-device-augment"],
}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/tmp/parity_ds")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--variants", nargs="+", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--out",
                   default=os.path.join(REPO, "PARITY_VARIANTS_CONVERGED.json"))
    args = p.parse_args()

    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for name in args.variants:
        entry = results.setdefault(name, {})
        for seed in args.seeds:
            if str(seed) in entry:
                print(f"[skip] {name} seed={seed}", flush=True)
                continue
            cmd = [
                sys.executable, "train.py",
                "--data-path", args.data, "--data-config", "no-ai",
                "--task", "binary", "--model", "unet_resnet50",
                "--loss", "lovasz_hinge",
                "--epochs", str(args.epochs), "--batch-size", "8",
                "--input-size", str(args.input_size), "--seed", str(seed),
                "--weights", "", "--ckpt-every", "0", "--defer-ckpt",
            ] + VARIANTS[name]
            print(f"[variant] {name} seed={seed}", flush=True)
            before = exp_dirs(REPO)
            res = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
            if res.returncode != 0:
                print(res.stdout[-3000:], res.stderr[-3000:], sep="\n",
                      flush=True)
                raise RuntimeError(f"{name} seed={seed} failed")
            exp = resolve_run_exp(REPO, before, "unet_resnet50",
                                  "lovasz_hinge", seed)
            tm_path = os.path.join(exp, "test_metrics.json")
            if not os.path.exists(tm_path):
                raise RuntimeError(
                    f"{name} seed={seed}: run produced no test_metrics.json "
                    "(test evaluation failed?); not recording"
                )
            with open(tm_path) as f:
                tm = json.load(f)
            entry[str(seed)] = {k: float(v) for k, v in tm.items()}
            print(f"  {name} seed={seed}: IoU={tm['IoU']:.4f}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
