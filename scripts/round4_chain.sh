#!/usr/bin/env bash
# Round-4 measurement chain: the study legs queued behind the TPU backlog
# (scripts/tpu_backlog.sh). Ordering rationale on this ONE-core host:
#   * all TPU legs first (ours matched-init f32/bf16, ours scaled multitask)
#     — each is ~10-15 min; CPU-hog torch legs would starve the relay
#     heartbeat if they ran concurrently, so they come strictly after;
#   * the scaled-multitask ref legs run only if ours actually learned in
#     the new regime (no point burning ~1 h of torch CPU on a regime that
#     is still degenerate);
#   * the 3 matched-init ref legs (~1.7 h each of torch CPU) run last,
#     nice-19, writing PARITY_MATCHED_INIT.json incrementally so partial
#     results are still usable at round end.
# Every leg gates on the driver sentinel (utils/driver_gate.py) so bench /
# dryrun checks never share the core with a leg (round-3 judge finding).
#
# Usage: scripts/round4_chain.sh [backlog_pid]
set -uo pipefail
cd "$(dirname "$0")/.."

gate() { python -m unet_embroidery_seg_tpu.utils.driver_gate wait; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "waiting for backlog pid $WAIT_PID to exit"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

echo "== [1/5] matched-init: ours f32 (TPU) =="
gate
python scripts/parity_matched_init.py --only ours --gate || true

echo "== [2/5] matched-init: ours bf16 (TPU) =="
gate
python scripts/parity_matched_init.py --only ours_bf16 --gate || true

echo "== [3/5] scaled multitask: ours (TPU) =="
gate
python scripts/parity_study.py --configs multitask_bce_mt \
  --epochs 20 --input-size 128 --only ours --gate || true

echo "== [4/5] scaled multitask: ref (CPU) — only if ours learned =="
if python - <<'EOF'
import json, sys
try:
    d = json.load(open("PARITY_RESULTS.json"))
    iou = d.get("multitask_bce_mt/ours", {}).get("IoU", {}).get("mean", 0.0)
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

echo "== [5/5] matched-init: ref (long torch-CPU legs, nice-19) =="
gate
nice -n 19 python scripts/parity_matched_init.py --only ref --gate || true

echo "round4 chain complete"
date
