#!/bin/sh
# Supervised TPU queue, continuation session of round 3 (serial — never two
# TPU jobs at once, CLAUDE.md). The /tmp wipe between sessions killed queue5
# before any item ran, so the cache was cold again and three artifacts cited
# by benchmarks/README.md are still missing. bench.py is launched separately
# FIRST (it re-warms the compile cache and is the round-end driver gate);
# this queue waits for it, then lands artifacts by value-per-minute:
#
# 1. quality_protocol (2 seeds x 4k steps, train->tto->eval) — cheapest
#    missing artifact, restores the DESIGN-cited quality evidence.
# 2. 60k identity protocol (3 seeds, ~25 min/seed, seed-level idempotent —
#    partial artifacts carry "partial": true and resume).
# 3. 90k identity_hires regen (only reached if time allows).
set -x
cd /root/repo || exit 1

STALL_MIN=30
TRIES=3

# Wait for the separately-launched bench.py (pid file) to release the TPU.
if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 15; done
fi

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

watch_run /tmp/queue6_quality.log python scripts/quality_protocol.py

watch_run /tmp/queue6_identity60k.log \
  python scripts/pose_protocol.py --recipe identity --steps 60000

watch_run /tmp/queue6_identity90k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 90000

echo "SESSION QUEUE 6 DONE"
