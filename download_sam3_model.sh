#!/usr/bin/env bash
# Download the SAM3 checkpoint from ModelScope into weights/sam3/.
set -euo pipefail

TARGET_DIR="weights/sam3"
mkdir -p "$TARGET_DIR"

if ! command -v modelscope >/dev/null 2>&1; then
  echo "Installing modelscope CLI..."
  pip install modelscope
fi

echo "Downloading SAM3 weights to $TARGET_DIR ..."
modelscope download --model facebook/sam3 --local_dir "$TARGET_DIR"

echo "Done. Checkpoint at $TARGET_DIR/sam3.pt"
