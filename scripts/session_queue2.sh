#!/bin/sh
# Follow-up TPU queue (serial), run after session_queue.sh completes:
# 1. Regenerate the identity-recipe protocol artifact (3 seeds x 60k) —
#    the third DESIGN.md-cited summary lost with the scratch wipe.
# 2. Schedule-length extension: one 300k-step identity_hires seed (42) to
#    test whether the 150k descent continues (DESIGN.md "Resolution x
#    coverage study" — schedule length as the third axis).
set -x
cd /root/repo || exit 1

python scripts/pose_protocol.py --recipe identity --steps 60000 \
  2>&1 | tee /tmp/queue_identity60k.log

python scripts/pose_protocol.py --recipe identity_hires --steps 300000 \
  --seeds 42 --tag _300k_s42 2>&1 | tee /tmp/queue_identity300k.log

echo "SESSION QUEUE 2 DONE"
