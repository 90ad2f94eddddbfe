#!/usr/bin/env bash
# Round-5 measurement chain (VERDICT r4 asks #1, #3, #4, #6, #7, #10).
# Ordering rationale on this ONE-core host:
#   * TPU legs first, torch-CPU legs last (a CPU-hog torch leg starves the
#     relay heartbeat if concurrent — ROADMAP "Known environment traps");
#   * the FULL bench sweep runs first: it refreshes BENCH_LAST_FULL.json,
#     the snapshot the driver-budgeted bench.py back-fills shed sections
#     from — without it the round's official artifact has nothing to cite
#     for rows that don't fit the driver window;
#   * the 256^2 serving points run LAST among TPU legs: they are fresh
#     shapes (the round-4 relay wedge started in exactly such a cold
#     compile), so they must not sit in front of higher-priority legs;
#   * the fold-equivalence determinism pair precedes the new ref seeds:
#     it is a standing round-4 failure (the dataset fix is in
#     parity_matched_init.py now), while ref seeds 4-7 are ~1.7 h each and
#     expected to run out the round clock — whatever completes is recorded
#     idempotently.
# Every leg gates on the driver sentinel (utils/driver_gate.py) so bench /
# dryrun driver checks never share the core with a leg. Failures are loud:
# chain_lib.sh records per-leg PASS/FAIL and exits non-zero if any failed
# (round-4 VERDICT weak #2; tested by tests/test_chain_failure.py).
#
# Usage: scripts/round5_chain.sh [wait_pid]
set -uo pipefail
cd "$(dirname "$0")/.."
source scripts/chain_lib.sh

gate() { python -m unet_embroidery_seg_tpu.utils.driver_gate wait; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

# ---- TPU block ------------------------------------------------------------
# Guarded by a relay probe: when the TPU relay is hung (observed 2026-08-17,
# and again suspected 2026-08-19 23:00), train.py-based legs would hang with
# no timeout — skip the whole block loudly instead and fall through to the
# torch legs, which need no relay. The chain is idempotent: re-run it when
# the relay returns and completed points/seeds are skipped.

relay_up() { BENCH_SECTION=probe timeout 300 python bench.py >/dev/null 2>&1; }

if relay_up; then

gate
leg "full bench sweep (refresh BENCH_LAST_FULL.json)" \
  env BENCH_FULL=1 python bench.py

gate
leg "bench w1.5 decoder-width point" bash -c \
  'BENCH_SECTION=train:8:bce:w1.5 timeout 3600 python bench.py > /tmp/bench_w15.json && cat /tmp/bench_w15.json'

gate
leg "serving sweep 512^2 (b2-b32)" \
  python scripts/serving_sweep.py --sizes 512 --batches 1 2 4 8 16 32

for seed in 4 5 6 7; do
  gate
  leg "matched-init ours_bf16 seed $seed" \
    python scripts/parity_matched_init.py --only ours_bf16 --seeds "$seed" --gate
done

gate
leg "multitask pos_weight arm (ours, seeds 0 1 5)" \
  python scripts/parity_study.py --configs multitask_bce_mt_pw \
    --epochs 20 --input-size 128 --only ours --seeds 0 1 5 --gate

gate
leg "serving sweep 256^2 (fresh shapes)" \
  python scripts/serving_sweep.py --sizes 256 --batches 1 2 4 8 16 32

else
  echo "== TPU block SKIPPED: relay probe failed twice — re-run this chain when the relay returns =="
  CHAIN_FAILED+=("tpu-block (relay down; re-run scripts/round5_chain.sh on recovery)")
fi

# ---- torch-CPU block ------------------------------------------------------

for label in ref_rerun_screen_a ref_rerun_screen_b; do
  gate
  leg "fold-equivalence determinism $label" \
    nice -n 19 python scripts/parity_matched_init.py --only ref --seeds 0 \
      --epochs 15 --input-size 128 --ref-label "$label" \
      --out PARITY_MATCHED_INIT_SCREEN.json --gate
done

for seed in 4 5 6 7; do
  gate
  leg "matched-init ref seed $seed (torch CPU)" \
    nice -n 19 python scripts/parity_matched_init.py --only ref --seeds "$seed" --gate
done

chain_summary
