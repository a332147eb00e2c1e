#!/bin/bash
# DINO + DPT preprocessing for a custom scene
# (reference preprocess/preprocess_all_custom.sh:1-13 equivalent).
# Usage: sh scripts/preprocess_all_custom.sh <root_dir>
set -e
ROOT=$1
[ -z "$ROOT" ] && { echo "usage: $0 <root_dir>"; exit 1; }
python -m upnerf.cli.preprocess \
  --image_dir "${ROOT}/dense/images" \
  --save_dir "${ROOT}"
