#!/bin/bash
# Round-3 serialized TPU quality queue (never two TPU jobs at once):
#   1. synth_small convergence A/B on the r3 save_chain kernels, 2 seeds
#   2. pose-recovery protocol, 3 seeds (perturbation recipe)
#   3. identity-init protocol, 3 seeds
# Writes JSON/JSONL artifacts under outputs_validation/; idempotent-ish
# (each stage skips if its artifact already exists).
set -e
cd "$(dirname "$0")/.."

mkdir -p outputs_validation

if [ ! -d outputs_validation/scene ]; then
  python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
from upnerf.data import synthetic
synthetic.generate_scene('outputs_validation/scene', n_train=8, n_test=2,
                         H=64, W=80, feat_hw=16, feat_dim=32, focal=80.0)"
fi

for seed in 42 777; do
  out="outputs_validation/out/synth/r3_ab_seed${seed}/metrics.jsonl"
  if [ ! -f "$out" ]; then
    echo "=== synth_small A/B seed $seed ==="
    python -m upnerf.cli.train --config configs/validation/synth_small.yaml \
      seed "$seed" exp_name "r3_ab_seed${seed}" \
      out_dir outputs_validation/out
  fi
  echo "--- final val psnr (seed $seed):"
  grep "val/psnr" "$out" | tail -2
done

if [ ! -f benchmarks/pose_protocol_pose.json ]; then
  echo "=== pose protocol (3 seeds x 15k) ==="
  python scripts/pose_protocol.py --recipe pose --steps 15000
fi

if [ ! -f benchmarks/pose_protocol_identity.json ]; then
  echo "=== identity protocol (3 seeds x 60k) ==="
  python scripts/pose_protocol.py --recipe identity --steps 60000
fi

echo "QUEUE DONE"
