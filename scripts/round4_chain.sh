#!/usr/bin/env bash
# Round-4 measurement chain: the study legs queued behind the TPU backlog
# (scripts/tpu_backlog.sh). Ordering rationale on this ONE-core host:
#   * matched-init arms run as PER-SEED (f32, bf16) PAIRS, most important
#     seeds first — the study's deliverable is the paired per-seed dtype
#     delta, so a partially-completed chain still yields usable pairs
#     (an all-f32-then-all-bf16 order would leave zero pairs if cut);
#   * all TPU legs precede all torch-CPU legs — CPU-hog torch would starve
#     the relay heartbeat if concurrent (ROADMAP "Known environment traps");
#   * the matched-init REF arm is FOLDED from PARITY_CONVERGED.json
#     instead of re-run: a ref matched-init leg is a deterministic replica
#     of the converged ref leg for the same seed (see parity_matched_init
#     --fold-ref help). That saves ~5 h of torch CPU, which funds seeds 3
#     on the ours arms and one real ref seed-0 leg recorded as
#     'ref_rerun' — the end-to-end determinism check of the fold;
#   * the scaled-multitask ref legs run only if ours actually learned in
#     the new regime (no point burning ~1 h of torch CPU on a regime that
#     is still degenerate).
# Every leg gates on the driver sentinel (utils/driver_gate.py) so bench /
# dryrun checks never share the core with a leg (round-3 judge finding).
#
# Usage: scripts/round4_chain.sh [backlog_pid]
#   ROUND4_FROM_LEG=N  resume from leg N (1-6) after a VM/session restart;
#   completed matched-init seeds are cheap to re-run only if interrupted
#   mid-leg (each leg rewrites its own JSON key, so re-running is idempotent).
set -uo pipefail
cd "$(dirname "$0")/.."

FROM_LEG="${ROUND4_FROM_LEG:-1}"
runleg() { [ "$1" -ge "$FROM_LEG" ]; }

gate() { python -m unet_embroidery_seg_tpu.utils.driver_gate wait; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for backlog pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

if runleg 1; then
echo "== [1/6] matched-init: fold ref arm from converged evidence =="
gate
python scripts/parity_matched_init.py --fold-ref --seeds || true  # fold only
fi

if runleg 2; then
echo "== [2/6] matched-init pairs: seeds 0-1 (TPU, f32 then bf16 per seed) =="
for seed in 0 1; do
  gate
  python scripts/parity_matched_init.py --only ours --seeds "$seed" --gate || true
  gate
  python scripts/parity_matched_init.py --only ours_bf16 --seeds "$seed" --gate || true
done
fi

if runleg 3; then
echo "== [3/6] scaled multitask: ours (TPU) =="
gate
python scripts/parity_study.py --configs multitask_bce_mt \
  --epochs 20 --input-size 128 --only ours --gate || true
fi

if runleg 4; then
echo "== [4/6] matched-init pairs: seeds 2-3 (TPU) =="
for seed in 2 3; do
  gate
  python scripts/parity_matched_init.py --only ours --seeds "$seed" --gate || true
  gate
  python scripts/parity_matched_init.py --only ours_bf16 --seeds "$seed" --gate || true
done
fi

if runleg 5; then
echo "== [5/6] scaled multitask: ref (CPU, nice-19) — only if ours learned =="
if python - <<'EOF'
import json, sys
try:
    d = json.load(open("PARITY_RESULTS.json"))
    iou = d["multitask_bce_mt/ours"].get("IoU", {}).get("mean", 0.0)
except Exception:
    iou = 0.0
print(f"multitask_bce_mt/ours IoU mean = {iou}")
sys.exit(0 if iou > 0.15 else 1)
EOF
then
  gate
  nice -n 19 python scripts/parity_study.py --configs multitask_bce_mt \
    --epochs 20 --input-size 128 --only ref --gate || true
else
  echo "SKIP ref multitask legs: ours IoU still degenerate in the scaled regime"
fi
fi

if runleg 6; then
echo "== [6/6] matched-init: ref seed-0 determinism check (torch CPU, nice-19) =="
gate
nice -n 19 python scripts/parity_matched_init.py --only ref --seeds 0 \
  --ref-label ref_rerun --gate || true
fi

echo "round4 chain complete"
date
