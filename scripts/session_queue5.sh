#!/bin/sh
# Supervised TPU queue (serial — never two TPU jobs at once, CLAUDE.md).
# Session restart wiped /tmp (queue3 items 2-4 + queue4 never ran) and the
# outputs_validation/ scratch, so the compile cache is cold and the 60k/90k
# protocol artifacts cited by docs/DESIGN.md "Seed-protocoled pose
# benchmarks" are still missing. Order by value-per-minute:
#
# 1. bench.py sanity at HEAD — the driver runs it at round end and it has
#    NOT run end-to-end since the fast-render capture (e2b27fc); also
#    re-warms /tmp/upnerf_jax_cache for everything downstream.
# 2. Regenerate the 60k identity protocol artifact (3 seeds, ~25 min/seed).
# 3. Regenerate the 90k identity_hires protocol artifact (3 seeds,
#    ~60 min/seed; seed-level idempotent, partial seeds resume).
# 4. Schedule-length extension: one 300k identity_hires seed (42).
set -x
cd /root/repo || exit 1

STALL_MIN=30   # remote compiles can take many minutes; relay hangs are infinite
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

watch_run /tmp/queue5_bench.log python bench.py

watch_run /tmp/queue5_identity60k.log \
  python scripts/pose_protocol.py --recipe identity --steps 60000

watch_run /tmp/queue5_identity90k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 90000

watch_run /tmp/queue5_identity300k.log \
  python scripts/pose_protocol.py --recipe identity_hires --steps 300000 \
  --seeds 42 --tag _300k_s42

echo "SESSION QUEUE 5 DONE"
