#!/usr/bin/env bash
# Paper pipeline driver for the TPU framework. Four stages, coordinated
# through run/train/exp*/ JSON artifacts:
#   1. loss comparison (BCE vs Lovasz-hinge) on the loss-compare model
#   2. pick the winner by validation best_score
#   3. model comparison across the four U-Net variants at that loss
#   4. attention ablation (both losses x {unet_plain, attention_unet}),
#      then scripts/make_tables.py renders the CSV tables.
set -euo pipefail

# CLIs live next to this script; artifacts (run/, caches) go to $PWD, so the
# pipeline can run from any working directory.
script_dir=$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)

show_help() {
  cat <<'USAGE'
usage: bash run.sh [options]

  --data-config  no-ai|full|sam3     (default no-ai)
  --task         binary|multiclass|multitask
  --epochs N  --batch-size N  --input-size N  --workers N  --seed N
  --weights PATH  --python BIN  --cache-dir DIR
  --data-path DIR|synthetic          (default hf_datasets/merged_dataset_v2)
  --hf-repo ID  --hf-local-dir DIR
  --max-batches N                    cap train/val/test batches (smoke runs)
  --max-stage N                      stop after stage N (1=loss compare,
                                     2=+winner pick, 3=+model compare,
                                     4=all; tables render for whatever ran)
  --model NAME                       override the loss-compare model

outputs: run/train/exp*/ (weights, metrics, curves) and run/tables/*.csv

examples:
  bash run.sh --epochs 50 --batch-size 16 --data-config no-ai
  bash run.sh --data-path synthetic --epochs 2 --max-batches 2   # smoke
USAGE
}

# ---- defaults -------------------------------------------------------------
cfg_data="no-ai";    cfg_task="binary";   cfg_epochs=50
cfg_batch=8;         cfg_size=512;        cfg_workers=4
cfg_seed=11;         cfg_weights="";      py=python
cfg_cache=".hf-cache/datasets"
hf_repo="tari-tech/13803867589-unet-image-seg"
hf_dir="hf_datasets/merged_dataset_v2"
data_path="";        cap=0;               override_model=""
max_stage=4

while (( $# )); do
  case "$1" in
    --data-config)  cfg_data=$2;   shift 2 ;;
    --task)         cfg_task=$2;   shift 2 ;;
    --epochs)       cfg_epochs=$2; shift 2 ;;
    --batch-size)   cfg_batch=$2;  shift 2 ;;
    --input-size)   cfg_size=$2;   shift 2 ;;
    --workers)      cfg_workers=$2; shift 2 ;;
    --seed)         cfg_seed=$2;   shift 2 ;;
    --weights)      cfg_weights=$2; shift 2 ;;
    --python)       py=$2;         shift 2 ;;
    --cache-dir)    cfg_cache=$2;  shift 2 ;;
    --hf-repo)      hf_repo=$2;    shift 2 ;;
    --hf-local-dir) hf_dir=$2;     shift 2 ;;
    --data-path)    data_path=$2;  shift 2 ;;
    --max-batches)  cap=$2;        shift 2 ;;
    --max-stage)    max_stage=$2;  shift 2 ;;
    --model)        override_model=$2; shift 2 ;;
    -h|--help)      show_help; exit 0 ;;
    *) echo "unknown argument: $1" >&2; show_help; exit 1 ;;
  esac
done

case "$cfg_data" in no-ai|full|sam3) ;; *) echo "bad --data-config: $cfg_data" >&2; exit 1 ;; esac
case "$cfg_task" in binary|multiclass|multitask) ;; *) echo "bad --task: $cfg_task" >&2; exit 1 ;; esac
command -v "$py" >/dev/null || { echo "python not found: $py" >&2; exit 1; }

data_path=${data_path:-$hf_dir}
mkdir -p "$cfg_cache" .hf-cache .mpl-cache run/train run/tables
export HF_HOME=.hf-cache HF_DATASETS_CACHE="$cfg_cache" MPLCONFIGDIR=.mpl-cache

banner() { printf '\n==============================\n%s\n==============================\n' "$*"; }

fetch_dataset_if_needed() {
  [[ "$data_path" == synthetic* ]] && return 0
  [[ -d "$data_path/$cfg_data" ]] && return 0
  banner "dataset missing ($data_path/$cfg_data): trying HF hub $hf_repo"
  mkdir -p "$data_path"
  if ! "$py" -c "
from huggingface_hub import snapshot_download
snapshot_download(repo_id='$hf_repo', repo_type='dataset', local_dir='$data_path')
print('downloaded to $data_path')
"; then
    echo "[WARN] download failed (offline?); switching to the synthetic source"
    data_path="synthetic"
    return 0
  fi
  if [[ ! -d "$data_path/$cfg_data" ]]; then
    echo "[WARN] download completed but $data_path/$cfg_data still missing; using synthetic"
    data_path="synthetic"
  fi
}

newest_exp=""
fit() { # fit MODEL LOSS — one training run; records newest_exp
  local model=$1 loss=$2
  banner "train: task=$cfg_task model=$model loss=$loss data=$cfg_data"
  # --no-amp pins one compute dtype across every compared run: train.py's
  # per-config default (f32 for resnet50+lovasz, bf16 otherwise) would
  # otherwise confound the stage-1 loss tables and stage-3 model tables
  # with a dtype variable that make_tables doesn't record. f32 is the
  # accuracy-safe uniform choice for a paper pipeline (PARITY.md).
  "$py" "$script_dir/train.py" \
    --task "$cfg_task" --data-config "$cfg_data" --data-path "$data_path" \
    --model "$model" --loss "$loss" --weights "$cfg_weights" --no-amp \
    --epochs "$cfg_epochs" --batch-size "$cfg_batch" --input-size "$cfg_size" \
    --workers "$cfg_workers" --seed "$cfg_seed" --cache-dir "$cfg_cache" \
    --max-train-batches "$cap" --max-val-batches "$cap" --max-test-batches "$cap"
  newest_exp=$(ls -dt run/train/exp* 2>/dev/null | head -n1)
  [[ -n "$newest_exp" ]] || { echo "no experiment folder produced" >&2; exit 1; }
  echo "saved: $newest_exp"
}

read_summary_field() { # read_summary_field EXPDIR FIELD
  "$py" -c "
import json, sys
print(json.load(open('$1/summary.json')).get('$2', -1.0))
"
}

# ---------------------------------------------------------------------------
echo "python=$py data=$cfg_data task=$cfg_task epochs=$cfg_epochs batch=$cfg_batch size=$cfg_size"
fetch_dataset_if_needed

if [[ "$cfg_task" == multitask ]]; then
  # Only the two-headed multitask_unet is valid here — a --model override
  # (meant for the loss-compare stages) would make train.py refuse.
  if [[ -n "$override_model" && "$override_model" != multitask_unet ]]; then
    echo "[WARN] --model $override_model ignored for --task multitask (multitask_unet required)"
  fi
  fit multitask_unet bce
  echo "done (multitask is a single run)."
  exit 0
fi

compare_model=${override_model:-unet_resnet50}

# Losses under comparison are task-dependent: bce/lovasz_hinge are
# binary-only (train.py lowers them to CE for multiclass), so comparing
# them on a multiclass run would train two identical CE runs and label
# them as different losses in the tables.
if [[ "$cfg_task" == multiclass ]]; then
  loss_a=ce; loss_b=focal
else
  loss_a=bce; loss_b=lovasz_hinge
fi

render_tables() {
  banner "tables"
  "$py" "$script_dir/scripts/make_tables.py" --data-config "$cfg_data" --task "$cfg_task"
  echo "pipeline complete: run/train/exp*/ + run/tables/"
}

# stage 1: loss comparison
fit "$compare_model" "$loss_a"
val_a=$(read_summary_field "$newest_exp" best_score)
fit "$compare_model" "$loss_b"
val_b=$(read_summary_field "$newest_exp" best_score)
echo "val best_score: $loss_a=$val_a $loss_b=$val_b"
if (( max_stage < 2 )); then render_tables; exit 0; fi

# stage 2: pick the winner by validation score
winner=$(
  "$py" -c "print('$loss_b' if float('$val_b') >= float('$val_a') else '$loss_a')"
)
banner "best loss by val score: $winner"
if (( max_stage < 3 )); then render_tables; exit 0; fi

# stage 3: model comparison at the winning loss
for m in unet_plain unet_resnet50 attention_unet dualdense_unet; do
  fit "$m" "$winner"
done
if (( max_stage < 4 )); then render_tables; exit 0; fi

# stage 4: attention ablation across both losses
for l in "$loss_a" "$loss_b"; do
  for m in unet_plain attention_unet; do
    fit "$m" "$l"
  done
done

banner "tables"
"$py" "$script_dir/scripts/make_tables.py" --data-config "$cfg_data" --task "$cfg_task"
echo "pipeline complete: run/train/exp*/ + run/tables/"
