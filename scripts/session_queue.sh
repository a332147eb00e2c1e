#!/bin/sh
# Session TPU queue (serial — never two TPU jobs at once, CLAUDE.md).
# 1. Regenerate the pose-protocol artifact (3 seeds x 15k) into benchmarks/.
# 2. 150k-step identity_hires protocol across 3 seeds: completes the
#    DESIGN.md "Resolution x coverage study" 150k row (previously seeds
#    42/777 only) and produces the committed 3-seed artifact.
set -x
cd /root/repo || exit 1

python scripts/pose_protocol.py --recipe pose --steps 15000 \
  2>&1 | tee /tmp/queue_pose.log

python scripts/pose_protocol.py --recipe identity_hires --steps 150000 \
  --tag _150k 2>&1 | tee /tmp/queue_identity150k.log

echo "SESSION QUEUE DONE"
