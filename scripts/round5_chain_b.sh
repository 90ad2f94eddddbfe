#!/usr/bin/env bash
# Round-5 chain, part B: re-prioritized continuation of round5_chain.sh.
#
# Context: the relay's compile cache did not survive the 2026-08-19 VM
# restart, so chain A's full-bench leg ran ~2 h cold — at that rate the
# cheap, high-value torch legs at A's tail (the fold-equivalence
# determinism pair, VERDICT r4 ask #3) would never be reached before the
# round ends. Part B reorders by value-per-minute; every leg is idempotent
# (completed seeds/points are skipped by their scripts), so it is safe to
# run after chain A completed any prefix of its legs.
#
# Order: determinism pair (torch, ~25 min, closes a standing round-4
# failure) -> matched-init ours_bf16 seeds (TPU, the 8-seed widening's
# TPU half) -> serving 512 -> multitask pos_weight arm -> w1.5 bench point
# -> matched-init ref seeds (torch, ~1.7 h each, run out the clock)
# -> serving 256 (fresh shapes, lowest priority).
set -uo pipefail
cd "$(dirname "$0")/.."
source scripts/chain_lib.sh

gate() { python -m unet_embroidery_seg_tpu.utils.driver_gate wait; }
relay_up() { BENCH_SECTION=probe timeout 300 python bench.py >/dev/null 2>&1; }

for label in ref_rerun_screen_a ref_rerun_screen_b; do
  gate
  leg "fold-equivalence determinism $label" \
    nice -n 19 python scripts/parity_matched_init.py --only ref --seeds 0 \
      --epochs 15 --input-size 128 --ref-label "$label" \
      --out PARITY_MATCHED_INIT_SCREEN.json --gate
done

if relay_up; then

for seed in 4 5 6 7; do
  gate
  leg "matched-init ours_bf16 seed $seed" \
    python scripts/parity_matched_init.py --only ours_bf16 --seeds "$seed" --gate
done

gate
leg "serving sweep 512^2 (b2-b32)" \
  python scripts/serving_sweep.py --sizes 512 --batches 1 2 4 8 16 32

gate
leg "multitask pos_weight arm (ours, seeds 0 1 5)" \
  python scripts/parity_study.py --configs multitask_bce_mt_pw \
    --epochs 20 --input-size 128 --only ours --seeds 0 1 5 --gate

gate
leg "bench w1.5 decoder-width point" bash -c \
  'BENCH_SECTION=train:8:bce:w1.5 timeout 3600 python bench.py > /tmp/bench_w15.json && cat /tmp/bench_w15.json'

else
  echo "== TPU block SKIPPED: relay probe failed — re-run on recovery =="
  CHAIN_FAILED+=("tpu-block (relay down; re-run scripts/round5_chain_b.sh on recovery)")
fi

for seed in 4 5 6 7; do
  gate
  leg "matched-init ref seed $seed (torch CPU)" \
    nice -n 19 python scripts/parity_matched_init.py --only ref --seeds "$seed" --gate
done

if relay_up; then
gate
leg "serving sweep 256^2 (fresh shapes)" \
  python scripts/serving_sweep.py --sizes 256 --batches 1 2 4 8 16 32
fi

chain_summary
