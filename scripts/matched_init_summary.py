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

    def paired_delta(a: dict, b: dict, label: str) -> None:
        """Per-seed (a - b) IoU deltas + mean with a 95% CI on the mean.

        CI uses the t critical value (two-sided, n-1 dof; table for the
        small n this study runs — no scipy in the image). This is the
        'stated confidence interval on Δ' the 8-seed widening reports.
        """
        paired = sorted(set(a) & set(b), key=int)
        if not paired:
            return
        deltas = [a[s]["IoU"] - b[s]["IoU"] for s in paired]
        print(f"\npaired {label} IoU deltas, identical init+data:")
        for s, dv in zip(paired, deltas):
            print(f"  seed {s}: {dv:+.4f}"
                  f"  ({a[s]['IoU']:.4f} vs {b[s]['IoU']:.4f})")
        n = len(deltas)
        mean = statistics.mean(deltas)
        if n > 1:
            sd = statistics.stdev(deltas)
            t95 = {2: 12.71, 3: 4.30, 4: 3.18, 5: 2.78, 6: 2.57, 7: 2.45,
                   8: 2.36, 9: 2.31, 10: 2.26}.get(n, 2.0)
            half = t95 * sd / n ** 0.5
            print(f"  mean {mean:+.4f} ± {sd:.4f} (sd);"
                  f" 95% CI on mean Δ: [{mean - half:+.4f}, {mean + half:+.4f}]"
                  f" (t, n={n})")
            if mean - half <= 0 <= mean + half:
                print("  -> CI contains 0: no resolvable systematic"
                      " difference at this seed count")
            else:
                print("  -> CI excludes 0: systematic difference")
        else:
            print(f"  mean {mean:+.4f} (single pair — no CI)")

    ours = arms.get("ours", {})
    bf16 = arms.get("ours_bf16", {})
    paired_delta(ours, bf16, "(f32 - bf16)")
    # The parity question itself: ours at the bf16 default vs the torch
    # reference, matched init per seed (round-4 VERDICT #4's 8-seed table).
    paired_delta(bf16, arms.get("ref", {}), "(ours_bf16 - ref)")

    ref = arms.get("ref", {})
    rerun = arms.get("ref_rerun", {})
    for s in sorted(set(ref) & set(rerun), key=int):
        dv = rerun[s]["IoU"] - ref[s]["IoU"]
        print(f"\nfold determinism check seed {s}: rerun - folded = {dv:+.6f}"
              f"  ({'EXACT' if dv == 0 else 'MISMATCH — fold invalid!'})")


if __name__ == "__main__":
    main()
