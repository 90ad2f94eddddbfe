#!/usr/bin/env bash
# Round-4 finisher: short, driver-gated torch-CPU legs that replace
# round4_chain.sh's 1.7-h leg 6. Rationale: a single 1.7-h torch leg
# cannot yield to end-of-round driver checks mid-leg (the round-3 judge
# finding the driver_gate protocol exists to prevent), so the converged
# determinism check is swapped for an equivalent pair of ~12-min
# screening-regime legs; the converged rerun stays queued in ROADMAP.md.
#
# Legs (each ~10-15 min torch CPU, nice-19, sentinel-gated between legs):
#   A. ref multitask seeds 3-5 — ours seed 5 collapsed to the trivial
#      all-background attractor (IoU 0.0007); a fair comparison needs the
#      reference's collapse rate over the same seeds, not just 0-2.
#   B. fold-equivalence determinism check at screening cost: matched-init
#      ref seed 0 at 15 ep / 128^2, run TWICE (labels _a/_b). _a == _b
#      proves end-to-end torch determinism through the matched-init code
#      path (export -> --weights load -> train); both ≈ the round-2
#      screening value (PARITY.md: ref seed 0 = 0.325) bounds env drift.
#
# Leg 0 (TPU, runs FIRST, holding the driver sentinel so the torch legs
# cannot overlap it on this one-core host): the seed-5 escape-time
# diagnostic. Every learned seed's val history shows 9-11 epochs pinned
# at IoU 0 inside the trivial attractor before escaping; seed 5 simply
# had not escaped by epoch 20. One 40-epoch rerun of the same leg tests
# whether the "collapse" is an escape-TIME tail rather than a permanent
# failure. Run directly via train.py (not parity_study) so the live
# 20-epoch regime key is not archived; recorded in PARITY.md prose.
#
# Usage: scripts/round4_finisher.sh [wait_pid]
set -uo pipefail
cd "$(dirname "$0")/.."

gate() { python -m unet_embroidery_seg_tpu.utils.driver_gate wait; }
SENTINEL="${UNET_TPU_DRIVER_SENTINEL:-/tmp/unet_tpu_driver_busy}"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (TPU block) to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 5; done
fi

echo "== [0] multitask ours seed 5 @ 40 epochs (TPU escape-time diagnostic) =="
gate
echo $$ > "$SENTINEL"
trap 'rm -f "$SENTINEL"' EXIT
python train.py --data-path /tmp/parity_ds_mt --data-config no-ai \
  --task multitask --model multitask_unet --loss bce \
  --epochs 40 --batch-size 8 --input-size 128 --seed 5 --weights "" \
  --ckpt-every 0 --defer-ckpt --device-augment || true
rm -f "$SENTINEL"

echo "== [A] scaled multitask: ref seeds 3-5 (torch CPU, nice-19) =="
gate
nice -n 19 python scripts/parity_study.py --configs multitask_bce_mt \
  --epochs 20 --input-size 128 --only ref --seeds 3 4 5 --gate || true

echo "== [B] fold-equivalence determinism pair (screening regime) =="
for label in ref_rerun_screen_a ref_rerun_screen_b; do
  gate
  nice -n 19 python scripts/parity_matched_init.py --only ref --seeds 0 \
    --epochs 15 --input-size 128 --ref-label "$label" \
    --out PARITY_MATCHED_INIT_SCREEN.json --gate || true
done

echo "round4 finisher complete"
date
