#!/bin/bash
# Download + unpack a Phototourism scene and its split tsv
# (reference scripts/download_phototourism.sh:1-12 equivalent).
# Usage: sh scripts/download_phototourism.sh <scene_name>
set -e
SCENE=$1
[ -z "$SCENE" ] && { echo "usage: $0 <scene_name>"; exit 1; }
mkdir -p data/phototourism
cd data/phototourism
wget "https://cvg-data.inf.ethz.ch/research/imc-pt/${SCENE}.tar.gz"
tar -xzf "${SCENE}.tar.gz"
rm "${SCENE}.tar.gz"
cp "../../tsv/${SCENE}.tsv" "${SCENE}/"
echo "scene ${SCENE} ready under data/phototourism/${SCENE}"
