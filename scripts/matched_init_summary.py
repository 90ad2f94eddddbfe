"""Summarize PARITY_MATCHED_INIT.json: bands + paired per-seed dtype deltas.

The matched-init study's deliverable is twofold (PARITY.md):
  * ours-vs-ref bands with init sampling removed as a variable — does the
    (unet_resnet50, lovasz_hinge) converged-regime gap survive identical
    weights?
  * paired per-seed (f32 - bf16) deltas with identical init AND data — the
    pure compute-dtype effect, which is the evidence the
    train.resolve_amp_default f32 flip actually needs (the unpaired 3-seed
    TPU f32 band was indistinguishable from the bf16 band,
    PARITY_VARIANTS_CONVERGED.json).

Usage: python scripts/matched_init_summary.py [PARITY_MATCHED_INIT.json]
"""

from __future__ import annotations

import json
import statistics
import sys


def band(vals: list[float]) -> str:
    if not vals:
        return "(no seeds)"
    mean = statistics.mean(vals)
    std = statistics.stdev(vals) if len(vals) > 1 else 0.0
    runs = ", ".join(f"{v:.4f}" for v in vals)
    return f"{mean:.4f} ± {std:.4f}  [{runs}]"


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "PARITY_MATCHED_INIT.json"
    with open(path) as f:
        d = json.load(f)

    arms = {k: v for k, v in d.items()
            if isinstance(v, dict) and k not in ("regime",)}
    print(f"regime: {d.get('regime')}\n")
    for arm, seeds in arms.items():
        ordered = sorted(seeds, key=int)
        print(f"{arm:10s} IoU {band([seeds[s]['IoU'] for s in ordered])}"
              f"  (seeds {', '.join(ordered)})")

    ours = arms.get("ours", {})
    bf16 = arms.get("ours_bf16", {})
    paired = sorted(set(ours) & set(bf16), key=int)
    if paired:
        deltas = [ours[s]["IoU"] - bf16[s]["IoU"] for s in paired]
        print(f"\npaired (f32 - bf16) IoU deltas, identical init+data:")
        for s, dv in zip(paired, deltas):
            print(f"  seed {s}: {dv:+.4f}"
                  f"  (f32 {ours[s]['IoU']:.4f}, bf16 {bf16[s]['IoU']:.4f})")
        print(f"  mean {statistics.mean(deltas):+.4f}"
              + (f" ± {statistics.stdev(deltas):.4f}" if len(deltas) > 1
                 else ""))

    ref = arms.get("ref", {})
    rerun = arms.get("ref_rerun", {})
    for s in sorted(set(ref) & set(rerun), key=int):
        dv = rerun[s]["IoU"] - ref[s]["IoU"]
        print(f"\nfold determinism check seed {s}: rerun - folded = {dv:+.6f}"
              f"  ({'EXACT' if dv == 0 else 'MISMATCH — fold invalid!'})")


if __name__ == "__main__":
    main()
