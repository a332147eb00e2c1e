#!/bin/bash
# Turnkey real-data parity run for a NETWORKED TPU host (VERDICT r2 next #6).
#
# Reproduces the reference's full workflow end-to-end
# (/root/reference/README.md: download -> DINO/DPT preprocessing ->
# prepare_phototourism.py -> train.py -> tto.py -> eval.py) and records the
# BASELINE.md parity rows (PSNR/SSIM/LPIPS + rotation/translation errors on
# brandenburg_gate). This box has zero network egress, so the download /
# weight-fetch stages cannot run here — every stage is guarded by an
# existence check, making the script resumable AND testable offline
# (tests/test_runbook.py drives it with the network stages pre-satisfied).
#
# Usage (from the repo root):
#   sh scripts/run_brandenburg_e2e.sh
# Tunables (env):
#   SCENE       (default brandenburg_gate — any configs/<scene>.yaml works)
#   ASSETS      converted-weights dir  (default assets/weights)
#   EXP         experiment name        (default parity)
#   MAX_STEPS   train steps            (default 600000, reference schedule)
#   DRY_RUN=1   print every command instead of executing (plumbing check)
set -e

SCENE=${SCENE:-brandenburg_gate}
ASSETS=${ASSETS:-assets/weights}
EXP=${EXP:-parity}
MAX_STEPS=${MAX_STEPS:-600000}

# Public checkpoints the reference pipeline uses:
# DINO ViT-S/8 (preprocess/save_dino_feature.py via dino-vit-features) and
# DPT-Large midas (preprocess/save_dpt_depth.py, auto-downloaded by the
# reference's preprocess_all.sh).
DINO_URL="https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth"
DPT_URL="https://github.com/intel-isl/DPT/releases/download/1_0/dpt_large-midas-2f21e586.pt"

ROOT="data/phototourism/${SCENE}"
OUT="outputs/${SCENE}/${EXP}"

run() {
  echo "=== [$(date +%H:%M:%S)] $*"
  if [ -z "${DRY_RUN}" ]; then "$@"; fi
}

# ---- 1. scene download ----------------------------------------------------
if [ ! -d "${ROOT}/dense" ]; then
  run sh scripts/download_phototourism.sh "${SCENE}"
fi

# ---- 2. pretrained weights -> npz assets ----------------------------------
mkdir -p "${ASSETS}"
if [ ! -f "${ASSETS}/dino_vits8.npz" ]; then
  run wget -q -O "${ASSETS}/dino_vits8.pth" "${DINO_URL}"
  run python -m upnerf.cli.convert_weights dino \
    "${ASSETS}/dino_vits8.pth" "${ASSETS}/dino_vits8.npz"
fi
if [ ! -f "${ASSETS}/dpt_large.npz" ]; then
  run wget -q -O "${ASSETS}/dpt_large.pt" "${DPT_URL}"
  run python -m upnerf.cli.convert_weights dpt \
    "${ASSETS}/dpt_large.pt" "${ASSETS}/dpt_large.npz"
fi
if [ ! -f "${ASSETS}/lpips_alex.npz" ]; then
  # needs `pip install lpips` once, on the networked host; PSNR/SSIM parity
  # still runs without it (tto/eval degrade gracefully)
  run python -m upnerf.cli.convert_weights lpips "${ASSETS}/lpips_alex.npz" \
    || echo "!!! lpips conversion failed (pip install lpips); continuing"
fi
export UPNERF_DINO_WEIGHTS="${ASSETS}/dino_vits8.npz"
export UPNERF_DPT_WEIGHTS="${ASSETS}/dpt_large.npz"
if [ -f "${ASSETS}/lpips_alex.npz" ]; then
  export UPNERF_LPIPS_WEIGHTS="${ASSETS}/lpips_alex.npz"
fi

# ---- 3. DINO feature maps + DPT depth maps --------------------------------
if [ ! -d "${ROOT}/DINO/feature_maps" ] || [ ! -d "${ROOT}/DPT" ]; then
  run sh scripts/preprocess_all.sh "${SCENE}"
fi

# ---- 4. ray cache ---------------------------------------------------------
# prepare_cache writes ${ROOT}/cache_tpu/scale<img_downscale>
# (upnerf/data/cache.py cache_dir_for) — caught by the real-execution test:
# the original guard checked ${ROOT}/cache and re-ran the stage every time.
if [ ! -d "${ROOT}/cache_tpu" ]; then
  run python -m upnerf.cli.prepare_cache --config "configs/${SCENE}.yaml"
fi

# ---- 5. train (auto-resumes from ${OUT}/ckpts if interrupted) -------------
run python -m upnerf.cli.train --config "configs/${SCENE}.yaml" \
  exp_name "${EXP}" max_steps "${MAX_STEPS}" phototourism.use_cache True

# ---- 6. test-time optimization over all test images -----------------------
run python -m upnerf.cli.tto --result_dir "${OUT}" --ckpt last

# ---- 7. metrics printout = the BASELINE.md parity rows --------------------
if [ -z "${DRY_RUN}" ]; then
  # no pipe: under `set -e` a pipeline's status is its LAST command (tee),
  # which would mask an eval failure — redirect, then print instead
  # (`set -o pipefail` is bash-only and this script must run under sh)
  python -m upnerf.cli.eval --result_dir "${OUT}" --ckpt last \
    > "${OUT}/parity_rows.txt" 2>&1
  cat "${OUT}/parity_rows.txt"
else
  run python -m upnerf.cli.eval --result_dir "${OUT}" --ckpt last
fi

echo "=== done. Parity rows: ${OUT}/parity_rows.txt (compare BASELINE.md)"
