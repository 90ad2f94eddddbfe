"""Inference serving characterization: batch-size sweep of predict throughput.

ROADMAP frontier #3: single-image predict is far from saturating the chip —
batching is the serving lever (shipped as ``predict.py --batch``). This
measures how far it goes: device img/s for the flagship unet_resnet50
binary predictor (bf16, on-device softmax — the exact ``make_predict_fn``
semantics predict.py runs) across batch sizes and the two deployment
resolutions (the reference's hardcoded 480, training 512; plus 256 for
low-res serving).

Each (size, batch) point runs as a retried subprocess via bench.py's
``BENCH_SECTION=predict:<size>:<batch>`` worker — same chained-dispatch
timing, same crash tolerance against the relay's compile-kill flakes.

Usage (repo root):
    python scripts/serving_sweep.py [--sizes 256 480 512] \
        [--batches 1 2 4 8 16 32] [--out SERVING.json]

Writes the JSON (incrementally — safe to re-run, completed points are kept)
and prints a markdown table for docs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402  (pure-Python supervisor; no jax import)


def run_point(size: int, batch: int, retries: int, timeout: float) -> dict | None:
    """One (size, batch) measurement via bench.py's retried-subprocess
    worker — the single home of the relay crash-tolerance logic."""
    os.environ["BENCH_RETRIES"] = str(retries)
    os.environ["BENCH_SECTION_TIMEOUT"] = str(timeout)
    print(f"[serving] {size}^2 b{batch}", file=sys.stderr, flush=True)
    return bench._run_sub(f"predict:{size}:{batch}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=int, nargs="+", default=[256, 480, 512])
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8, 16, 32])
    # Defaults defer to the env the recovery runbook (scripts/tpu_backlog.sh)
    # exports: killing a client mid-cold-compile is what wedged the relay for
    # 12+ h, and a single fresh-shape predict compile has been observed to
    # exceed 25 min — so per-point timeouts must be LONG and retries few.
    p.add_argument("--retries", type=int,
                   default=int(os.environ.get("BENCH_RETRIES", "1")))
    p.add_argument("--timeout", type=float,
                   default=float(os.environ.get("BENCH_SECTION_TIMEOUT",
                                                "3600")))
    p.add_argument("--out", default=os.path.join(REPO, "SERVING.json"))
    args = p.parse_args()

    results: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    try:
        for size in args.sizes:
            row = results.setdefault(str(size), {})
            for batch in args.batches:
                if str(batch) in row:
                    print(f"[skip] {size}^2 b{batch}", file=sys.stderr,
                          flush=True)
                    continue
                point = run_point(size, batch, args.retries, args.timeout)
                if point is not None:
                    row[str(batch)] = point
                    with open(args.out, "w") as f:
                        json.dump(results, f, indent=2)
    except bench.RelayDown as e:
        # Completed points are already on disk; re-run resumes from them.
        print(f"[serving] aborting sweep, TPU relay unreachable ({e})",
              file=sys.stderr, flush=True)

    # Markdown table: rows = batch, one img/s + ms/img column pair per size.
    batches = sorted({int(b) for row in results.values() for b in row})
    sizes = sorted(int(s) for s in results)
    header = "| batch | " + " | ".join(
        f"{s}² img/s | {s}² ms/img" for s in sizes) + " |"
    print(header)
    print("|" + "---|" * (1 + 2 * len(sizes)))
    for b in batches:
        cells = []
        for s in sizes:
            pt = results.get(str(s), {}).get(str(b))
            if pt:
                cells += [f"{pt['images_per_sec']}", f"{pt['device_ms_per_image']}"]
            else:
                cells += ["—", "—"]
        print(f"| {b} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
