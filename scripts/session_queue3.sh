#!/bin/sh
# Supervised TPU queue (serial — never two TPU jobs at once, CLAUDE.md).
# Supersedes session_queue2.sh after the 10:04 relay hang: a wedged axon
# RPC never returns, so each command runs under a no-progress watchdog
# (no file under outputs_validation/, benchmarks/ or the log advancing for
# STALL_MIN minutes -> kill and re-issue). pose_protocol.py is idempotent
# at the seed level (completed runs are reused, partial runs resume from
# their intermediate checkpoints), so re-issuing only redoes missing work.
#
# 1. Finish the 150k identity_hires protocol (seeds 42/777 complete on
#    disk; seed 1234 lost to the hang) -> benchmarks artifact.
# 2. Regenerate the identity-recipe protocol artifact (3 seeds x 60k) —
#    the third DESIGN.md-cited summary lost with the scratch wipe.
# 3. Schedule-length extension: one 300k-step identity_hires seed (42) to
#    test whether the 150k descent continues (DESIGN.md "Resolution x
#    coverage study" — schedule length as the third axis).
# 4. Sanity-check bench.py end-to-end at HEAD (the driver runs it at
#    round end; a broken bench gate is invisible until then).
set -x
cd /root/repo || exit 1

STALL_MIN=30   # remote compiles can take many minutes; hangs are infinite
TRIES=4

watch_run() {
  log=$1; shift
  n=0
  while [ "$n" -lt "$TRIES" ]; do
    n=$((n + 1))
    echo "[queue] attempt $n: $*" | tee -a "$log"
    "$@" >>"$log" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      fresh=$(find outputs_validation benchmarks /tmp/upnerf_jax_cache \
        "$log" -type f -mmin "-$STALL_MIN" 2>/dev/null | head -1)
      if [ -z "$fresh" ]; then
        echo "[queue] no progress for ${STALL_MIN}m; killing $pid" \
          | tee -a "$log"
        kill "$pid" 2>/dev/null
        sleep 120   # graceful-shutdown checkpoint window (orbax is atomic)
        kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"
    rc=$?
    [ "$rc" -eq 0 ] && return 0
    echo "[queue] attempt $n exited rc=$rc" | tee -a "$log"
  done
  return 1
}

watch_run /tmp/queue3_identity150k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 150000 \
  --tag _150k

watch_run /tmp/queue3_identity60k.log \
  python scripts/pose_protocol.py --recipe identity --steps 60000

watch_run /tmp/queue3_identity300k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 300000 \
  --seeds 42 --tag _300k_s42

watch_run /tmp/queue3_bench.log python bench.py

echo "SESSION QUEUE 3 DONE"
