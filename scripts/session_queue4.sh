#!/bin/sh
# Follow-up TPU queue, run AFTER session_queue3.sh prints DONE (serial —
# never two TPU jobs at once, CLAUDE.md). Regenerates the 90k-schedule
# identity_hires protocol artifact (pose_protocol_identity_hires.json,
# cited by docs/DESIGN.md "Seed-protocoled pose benchmarks"): the original
# runs were wiped with the outputs_validation/ scratch. Note a 90k run is
# NOT a truncation of the 150k artifact — max_steps drives the lr/c2f/
# candidate schedules — so this is a distinct measurement.
set -x
cd /root/repo || exit 1

STALL_MIN=30
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
        sleep 120
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

watch_run /tmp/queue4_identity90k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 90000

echo "SESSION QUEUE 4 DONE"
