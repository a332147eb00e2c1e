#!/bin/bash
# DINO + DPT preprocessing for a Phototourism scene
# (reference preprocess/preprocess_all.sh:1-16 equivalent).
# Requires converted weight assets:
#   UPNERF_DINO_WEIGHTS=<dino_vits8.npz> UPNERF_DPT_WEIGHTS=<dpt_large.npz>
# Usage: sh scripts/preprocess_all.sh <scene_name>
set -e
SCENE=$1
[ -z "$SCENE" ] && { echo "usage: $0 <scene_name>"; exit 1; }
ROOT="data/phototourism/${SCENE}"
python -m upnerf.cli.preprocess \
  --image_dir "${ROOT}/dense/images" \
  --save_dir "${ROOT}" \
  --tsv_path "${ROOT}/${SCENE}.tsv"
