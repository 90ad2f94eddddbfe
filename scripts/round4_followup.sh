#!/usr/bin/env bash
# Round-4 follow-up TPU block: runs AFTER the bench-sanity supervisor
# releases the driver sentinel, and HOLDS the sentinel itself so the
# round4_chain's pending torch-CPU leg (leg 6, matched-init ref
# determinism check) stays paused until the TPU-side work is done.
# Ordering rationale (ROADMAP "Known environment traps"): all TPU legs
# must precede the torch-CPU leg on this ONE-core host — a CPU-hog torch
# run starves the relay heartbeat under concurrent TPU dispatch.
#
# Legs:
#   1. multitask ours seeds 3-5 — tightens the weakest parity band
#      (ours 0.416±0.093 over 3 seeds vs ref 0.507±0.022, PARITY.md);
#   2. serving sweep extension — SERVING.json has only 480²×{1,8};
#      fill the batching curve at the reference's 480² and add 512².
#      256² is deliberately EXCLUDED: its cold predict compile is the
#      shape that wedged the relay for 12+ h on 2026-08-17.
set -uo pipefail
cd "$(dirname "$0")/.."

SENTINEL="${UNET_TPU_DRIVER_SENTINEL:-/tmp/unet_tpu_driver_busy}"

# Wait for the current holder (bench sanity) to finish, then claim.
python -m unet_embroidery_seg_tpu.utils.driver_gate wait
echo $$ > "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT
echo "[followup] sentinel claimed by $$"; date

echo "== [1/2] multitask ours seeds 3-5 (TPU) =="
python scripts/parity_study.py --configs multitask_bce_mt \
  --epochs 20 --input-size 128 --only ours --seeds 3 4 5 || true
touch "$SENTINEL"

echo "== [2/2] serving sweep: 480^2 batching curve + 512^2 =="
python scripts/serving_sweep.py --sizes 480 --batches 2 4 16 32 || true
touch "$SENTINEL"
python scripts/serving_sweep.py --sizes 512 --batches 1 8 || true

echo "[followup] done; releasing sentinel (leg 6 may start)"; date
