"""Matched-init converged parity: both frameworks from bit-identical weights.

Round-3's converged study left (unet_resnet50, lovasz_hinge) half-closed:
ref 0.335±0.033 vs ours-at-f32 0.294±0.048, with "half the gap is seed
variance" an interpretation, not a demonstration — our seed 1 was weak
under every variant tried. This removes init sampling as a variable
entirely:

  1. Sample ONE torch init per seed with the reference's own path
     (seed_everything + create_model -> weights_init,
     /root/reference/train.py:48-58, utils/utils.py:50) and save the
     state_dict.
  2. Convert it to our variables via utils/torch_interop (forward parity
     proven to 1.5e-08, tests/test_torch_interop.py).
  3. Train BOTH frameworks from that identical init on the byte-identical
     synthetic parquet dataset (same regime as PARITY_CONVERGED.json:
     40 epochs / 256^2 / b8; ref on CPU f32, ours at the f32 default).

With init fixed, any remaining delta is attributable to
optimizer/augmentation/dtype dynamics — or evaporates, demonstrating the
seed-variance explanation. Resumable; writes PARITY_MATCHED_INIT.json.

Usage:
    python scripts/parity_matched_init.py --data /tmp/parity_ds \
        [--seeds 0 1 2] [--only ours|ref] [--epochs 40] [--gate]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_study import (  # shared infra
    REF,
    ensure_dataset,
    ensure_ref_copy,
    exp_dirs,
    resolve_run_exp,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT_DIR = "/tmp/matched_init"

EXPORT_SNIPPET = """\
import sys, torch
sys.path.insert(0, ".")
from utils.utils import seed_everything
from train import create_model
seed_everything({seed})
model = create_model("unet_resnet50", num_classes=2, weights="")
torch.save(model.state_dict(), {out!r})
print("saved", {out!r})
"""


def export_init(seed: int) -> tuple[str, str]:
    """(pth, msgpack) paths for this seed's shared init, creating if needed."""
    os.makedirs(INIT_DIR, exist_ok=True)
    pth = os.path.join(INIT_DIR, f"seed{seed}.pth")
    msgpack = os.path.join(INIT_DIR, f"seed{seed}.msgpack")
    if not os.path.exists(pth):
        ensure_ref_copy()
        subprocess.run(
            [sys.executable, "-c", EXPORT_SNIPPET.format(seed=seed, out=pth)],
            cwd=REF, check=True,
        )
    if not os.path.exists(msgpack):
        # CPU-only conversion: never let the template init touch the TPU
        # relay (a bench section may hold it at this moment).
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, os.path.join("scripts", "import_torch_checkpoint.py"),
             "--weights", pth, "--out", msgpack,
             "--model", "unet_resnet50", "--task", "binary"],
            cwd=REPO, check=True, env=env,
        )
    return pth, msgpack


def run_leg(framework: str, seed: int, weights: str, args) -> dict:
    cwd = REF if framework == "ref" else REPO
    cmd = [
        sys.executable, "train.py",
        "--data-path", args.data, "--data-config", "no-ai",
        "--task", "binary", "--model", "unet_resnet50",
        "--loss", "lovasz_hinge",
        "--epochs", str(args.epochs), "--batch-size", "8",
        "--input-size", str(args.input_size), "--seed", str(seed),
        "--weights", weights,
    ]
    if framework == "ref":
        cmd += ["--device", "cpu", "--no-amp", "--workers", "0"]
    elif framework == "ours_bf16":
        # The dtype arm: identical init + data, bf16 compute. With init
        # fixed, (ours f32) - (ours bf16) is the pure dtype effect — the
        # evidence the resolve_amp_default flip actually needs (the full
        # 3-seed TPU f32 band came out indistinguishable from the bf16
        # band, PARITY_VARIANTS_CONVERGED.json).
        cmd += ["--ckpt-every", "0", "--defer-ckpt", "--amp"]
    else:
        # Mirror parity_variants' f32 variant (today's default for this
        # config) so matched-init rows compare 1:1 with the unmatched ones.
        cmd += ["--ckpt-every", "0", "--defer-ckpt", "--no-amp"]
    env = dict(os.environ)
    env.setdefault("OMP_NUM_THREADS", "8")
    print(f"[matched-init {framework}] seed={seed} weights={weights}",
          flush=True)
    before = exp_dirs(cwd)
    if framework == "ref" and getattr(args, "gate", False):
        # Ref legs are multi-hour host-CPU torch runs that cannot yield
        # between legs; run them SIGSTOP-gated so a driver check firing
        # mid-leg gets the one core to itself (driver_gate.run_gated —
        # CPU-only children; ours legs are TPU-relay clients and must
        # never be suspended).
        sys.path.insert(0, REPO)
        from unet_embroidery_seg_tpu.utils.driver_gate import run_gated

        res = run_gated(cmd, cwd=cwd, env=env)
    else:
        res = subprocess.run(
            cmd, cwd=cwd, env=env, capture_output=True, text=True
        )
    if res.returncode != 0:
        print(res.stdout[-3000:], res.stderr[-3000:], sep="\n", flush=True)
        raise RuntimeError(f"matched-init {framework} seed={seed} failed")
    exp = resolve_run_exp(cwd, before, "unet_resnet50", "lovasz_hinge", seed)
    tm_path = os.path.join(exp, "test_metrics.json")
    if not os.path.exists(tm_path):
        raise RuntimeError(
            f"matched-init {framework} seed={seed}: no test_metrics.json in "
            f"{exp} (test evaluation failed?); not recording"
        )
    with open(tm_path) as f:
        return json.load(f)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", default="/tmp/parity_ds")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--input-size", type=int, default=256)
    p.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2],
                   help="empty list (bare --seeds) runs no legs — useful "
                        "with --fold-ref to fold without training")
    p.add_argument("--only", choices=["ours", "ours_bf16", "ref"],
                   default=None)
    p.add_argument("--ref-label", default="ref",
                   help="results key for ref legs (e.g. 'ref_rerun' for the "
                        "determinism-check leg that duplicates a folded seed)")
    p.add_argument("--fold-ref", action="store_true",
                   help="Copy the converged-study ref per-seed metrics "
                        "(PARITY_CONVERGED.json resnet_lovasz/ref) into the "
                        "'ref' arm instead of re-running them. Valid because "
                        "a ref matched-init leg is a deterministic replica "
                        "of the converged ref leg for the same seed: the "
                        "exported init IS the init a real ref run draws "
                        "(dataset/loader construction consumes no torch RNG "
                        "— verified seed->model == seed->datasets->loaders->"
                        "model bit-exactly on this host), loading identical "
                        "weights over an identical init is a no-op, and CPU "
                        "torch with the reference's seed_everything is "
                        "deterministic. round4_chain.sh re-runs seed 0 for "
                        "real into 'ref_rerun' as the end-to-end check.")
    p.add_argument("--gate", action="store_true",
                   help="wait for driver checks (bench/dryrun) between legs")
    p.add_argument("--out",
                   default=os.path.join(REPO, "PARITY_MATCHED_INIT.json"))
    args = p.parse_args()

    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results.setdefault("regime", {
        "epochs": args.epochs, "input_size": args.input_size, "batch": 8,
        "config": "unet_resnet50+lovasz_hinge",
        "arms": {"ours": "tpu-f32", "ours_bf16": "tpu-bf16",
                 "ref": "cpu-f32"},
    })

    if args.fold_ref:
        with open(os.path.join(REPO, "PARITY_CONVERGED.json")) as f:
            converged = json.load(f)
        folded = results.setdefault("ref", {})
        # Seeds 0-2 sit under the metadata-archived key (the regime tuple
        # gained a 'platform' field mid-study, which archived the entry —
        # same 40ep/256²/f32-CPU regime); seed 3 is under the live key.
        for key in ("resnet_lovasz/ref",
                    "resnet_lovasz/ref@e40_i256_ampFalse_None"):
            entry = converged.get(key, {})
            assert (entry.get("epochs"), entry.get("input_size"),
                    entry.get("amp")) == (40, 256, False), key
            for seed, tm in entry.get("by_seed", {}).items():
                folded.setdefault(seed, {k: float(v) for k, v in tm.items()})
        results["ref_provenance"] = (
            "folded from PARITY_CONVERGED.json resnet_lovasz/ref (matched-"
            "init ref legs are deterministic replicas of the converged ref "
            "legs; see --fold-ref help + PARITY.md); ref_rerun holds the "
            "end-to-end determinism check"
        )
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[fold-ref] seeds {sorted(folded)} <- PARITY_CONVERGED.json",
              flush=True)

    if args.seeds:
        # Regenerate the parity dataset if /tmp was wiped (round-4 lesson:
        # the fold-equivalence leg crashed twice on a missing
        # /tmp/parity_ds — every leg must create its own inputs). The
        # export is deterministic (seeded synthetic), so a regenerated
        # tree is byte-identical to the original.
        ensure_dataset({}, args)
    for seed in args.seeds:
        pth, msgpack = export_init(seed)
        for framework in ("ours", "ours_bf16", "ref"):
            if args.only and framework != args.only:
                continue
            entry = results.setdefault(
                args.ref_label if framework == "ref" else framework, {}
            )
            if str(seed) in entry:
                print(f"[skip] {framework} seed={seed}", flush=True)
                continue
            if args.gate:
                sys.path.insert(0, REPO)
                from unet_embroidery_seg_tpu.utils.driver_gate import (
                    wait_until_idle,
                )
                wait_until_idle()
            tm = run_leg(framework, seed,
                         pth if framework == "ref" else msgpack, args)
            entry[str(seed)] = {k: float(v) for k, v in tm.items()}
            print(f"  {framework} seed={seed}: IoU={tm['IoU']:.4f}", flush=True)
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
