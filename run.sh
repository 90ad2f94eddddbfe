#!/usr/bin/env bash
# Full binary-segmentation paper pipeline (parity target: /root/reference/run.sh):
#   1) Loss compare (BCE vs Lovasz-hinge) on unet_resnet50
#   2) Pick best loss by val best_score
#   3) Model compare (4 U-Net variants) with best loss
#   4) Ablation (loss x attention on/off)
#   5) Generate paper-style CSV tables
# Stage coordination happens through run/train/exp*/ JSON artifacts, exactly
# like the reference; the trainer underneath is the TPU-native JAX engine.
set -euo pipefail

usage() {
  cat <<'EOF'
Run the full binary-segmentation pipeline on TPU.

Outputs:
  - run/train/exp*/ (weights, curves, metrics, vis)
  - run/tables/     (table_3_1_loss_compare.csv, table_3_2_model_compare.csv,
                     table_4_2_ablation.csv, all_runs.csv)

Examples:
  bash run.sh --epochs 50 --batch-size 16 --input-size 512 --data-config no-ai
  bash run.sh --data-config full
  bash run.sh --task multitask --model multitask_unet --data-config sam3
  bash run.sh --data-path synthetic --epochs 2 --max-batches 2   # smoke run

Options:
  --data-config   no-ai|full|sam3 (default: no-ai)
  --task          binary|multiclass|multitask (default: binary)
  --epochs        int        (default: 50)
  --batch-size    int        (default: 8)
  --input-size    int        (default: 512)
  --workers       int        (default: 4)
  --seed          int        (default: 11)
  --weights       path       (default: empty = from scratch)
  --python        path       (default: python)
  --cache-dir     path       (default: .hf-cache/datasets)
  --data-path     path       (default: hf_datasets/merged_dataset_v2; 'synthetic' for offline)
  --hf-repo       repo_id    (default: tari-tech/13803867589-unet-image-seg)
  --hf-local-dir  path       (default: hf_datasets/merged_dataset_v2)
  --max-batches   int        cap train/val/test batches per epoch (smoke runs)
  -h, --help
EOF
}

DATA_CONFIG="no-ai"
TASK="binary"
EPOCHS="50"
BATCH_SIZE="8"
INPUT_SIZE="512"
WORKERS="4"
SEED="11"
WEIGHTS=""
PYTHON="python"
CACHE_DIR=".hf-cache/datasets"
HF_REPO="tari-tech/13803867589-unet-image-seg"
HF_LOCAL_DIR="hf_datasets/merged_dataset_v2"
DATA_PATH=""
MAX_BATCHES="0"
MODEL=""

while [[ $# -gt 0 ]]; do
  case "$1" in
    --data-config) DATA_CONFIG="$2"; shift 2 ;;
    --task) TASK="$2"; shift 2 ;;
    --epochs) EPOCHS="$2"; shift 2 ;;
    --batch-size) BATCH_SIZE="$2"; shift 2 ;;
    --input-size) INPUT_SIZE="$2"; shift 2 ;;
    --workers) WORKERS="$2"; shift 2 ;;
    --seed) SEED="$2"; shift 2 ;;
    --weights) WEIGHTS="$2"; shift 2 ;;
    --python) PYTHON="$2"; shift 2 ;;
    --cache-dir) CACHE_DIR="$2"; shift 2 ;;
    --hf-repo) HF_REPO="$2"; shift 2 ;;
    --hf-local-dir) HF_LOCAL_DIR="$2"; shift 2 ;;
    --data-path) DATA_PATH="$2"; shift 2 ;;
    --max-batches) MAX_BATCHES="$2"; shift 2 ;;
    --model) MODEL="$2"; shift 2 ;;
    -h|--help) usage; exit 0 ;;
    *) echo "Unknown argument: $1"; usage; exit 1 ;;
  esac
done

if [[ "$DATA_CONFIG" != "no-ai" && "$DATA_CONFIG" != "full" && "$DATA_CONFIG" != "sam3" ]]; then
  echo "Invalid --data-config: $DATA_CONFIG"; exit 1
fi
if [[ "$TASK" != "binary" && "$TASK" != "multiclass" && "$TASK" != "multitask" ]]; then
  echo "Invalid --task: $TASK"; exit 1
fi

if ! command -v "$PYTHON" >/dev/null 2>&1; then
  echo "Python not found: $PYTHON"; exit 1
fi

DATA_PATH="${DATA_PATH:-$HF_LOCAL_DIR}"

mkdir -p "$CACHE_DIR" ".hf-cache" ".mpl-cache" "run/train" "run/tables"
export HF_HOME=".hf-cache"
export HF_DATASETS_CACHE="$CACHE_DIR"
export MPLCONFIGDIR=".mpl-cache"

ensure_dataset() {
  local cfg="$1"
  if [[ "$DATA_PATH" == synthetic* ]]; then
    return 0
  fi
  local expected_dir="$DATA_PATH/$cfg"
  if [[ -d "$expected_dir" ]]; then
    return 0
  fi
  echo ""
  echo "=============================="
  echo "Dataset not found: $expected_dir"
  echo "Attempting Hugging Face download: $HF_REPO"
  echo "=============================="
  mkdir -p "$DATA_PATH"
  if "$PYTHON" - <<PY
from huggingface_hub import snapshot_download
snapshot_download(
    repo_id="$HF_REPO",
    repo_type="dataset",
    local_dir="$DATA_PATH",
)
print("Downloaded: $HF_REPO -> $DATA_PATH")
PY
  then
    :
  else
    echo "[WARN] download failed (offline?). Falling back to the synthetic source."
    DATA_PATH="synthetic"
    return 0
  fi
  if [[ ! -d "$expected_dir" ]]; then
    echo "Download finished, but still missing: $expected_dir — using synthetic."
    DATA_PATH="synthetic"
  fi
}

latest_exp_dir() {
  ls -dt run/train/exp* 2>/dev/null | head -n 1
}

get_test_iou() {
  local exp_dir="$1"
  "$PYTHON" - <<PY
import json
from pathlib import Path
data = json.loads((Path("$exp_dir") / "test_metrics.json").read_text(encoding="utf-8"))
print(float(data["IoU"]))
PY
}

get_best_val_score() {
  local exp_dir="$1"
  "$PYTHON" - <<PY
import json
from pathlib import Path
data = json.loads((Path("$exp_dir") / "summary.json").read_text(encoding="utf-8"))
print(float(data.get("best_score", -1.0)))
PY
}

run_train() {
  local model="$1"
  local loss="$2"
  echo ""
  echo "=============================="
  echo "Train: task=$TASK model=$model loss=$loss data=$DATA_CONFIG"
  echo "=============================="
  "$PYTHON" train.py \
    --task "$TASK" \
    --data-config "$DATA_CONFIG" \
    --data-path "$DATA_PATH" \
    --epochs "$EPOCHS" \
    --batch-size "$BATCH_SIZE" \
    --workers "$WORKERS" \
    --input-size "$INPUT_SIZE" \
    --seed "$SEED" \
    --model "$model" \
    --loss "$loss" \
    --weights "$WEIGHTS" \
    --cache-dir "$CACHE_DIR" \
    --max-train-batches "$MAX_BATCHES" \
    --max-val-batches "$MAX_BATCHES" \
    --max-test-batches "$MAX_BATCHES"

  LAST_EXP_DIR="$(latest_exp_dir)"
  if [[ -z "${LAST_EXP_DIR:-}" ]]; then
    echo "Failed to locate latest exp directory under run/train/"
    exit 1
  fi
  echo "Saved to: $LAST_EXP_DIR"
}

LOSS_A="bce"
LOSS_B="lovasz_hinge"
MODEL_LOSS_COMPARE="${MODEL:-unet_resnet50}"
MODELS=("unet_plain" "unet_resnet50" "attention_unet" "dualdense_unet")
ABLATION_MODELS=("unet_plain" "attention_unet")

echo "Python: $PYTHON"
echo "Data config: $DATA_CONFIG"
echo "Task: $TASK"
echo "Epochs: $EPOCHS  Batch: $BATCH_SIZE  Input: $INPUT_SIZE  Workers: $WORKERS  Seed: $SEED"
echo ""

ensure_dataset "$DATA_CONFIG"

if [[ "$TASK" == "multitask" ]]; then
  run_train "${MODEL:-multitask_unet}" "$LOSS_A"
  echo "Done (multitask single run)."
  exit 0
fi

# 1) loss compare on unet_resnet50
run_train "$MODEL_LOSS_COMPARE" "$LOSS_A"
EXP_A="$LAST_EXP_DIR"
VAL_A="$(get_best_val_score "$EXP_A")"
IOU_A="$(get_test_iou "$EXP_A")"
echo "Val IoU ($MODEL_LOSS_COMPARE, $LOSS_A):  $VAL_A"
echo "Test IoU ($MODEL_LOSS_COMPARE, $LOSS_A): $IOU_A"

run_train "$MODEL_LOSS_COMPARE" "$LOSS_B"
EXP_B="$LAST_EXP_DIR"
VAL_B="$(get_best_val_score "$EXP_B")"
IOU_B="$(get_test_iou "$EXP_B")"
echo "Val IoU ($MODEL_LOSS_COMPARE, $LOSS_B):  $VAL_B"
echo "Test IoU ($MODEL_LOSS_COMPARE, $LOSS_B): $IOU_B"

BEST_LOSS="$("$PYTHON" - <<PY
a = float("$VAL_A")
b = float("$VAL_B")
print("$LOSS_B" if b >= a else "$LOSS_A")
PY
)"
echo ""
echo ">>> Best loss by val IoU: $BEST_LOSS"

# 2) model compare with best loss
for model in "${MODELS[@]}"; do
  run_train "$model" "$BEST_LOSS"
done

# 3) ablation: (loss x attention on/off)
for loss in "$LOSS_A" "$LOSS_B"; do
  for model in "${ABLATION_MODELS[@]}"; do
    run_train "$model" "$loss"
  done
done

# 4) generate tables
echo ""
echo "=============================="
echo "Generate tables"
echo "=============================="
"$PYTHON" scripts/make_tables.py --data-config "$DATA_CONFIG" --task binary

echo ""
echo "Done."
echo "  - Experiments: run/train/exp*/"
echo "  - Tables:      run/tables/"
