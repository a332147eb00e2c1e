#!/bin/sh
# Serial TPU job queue with stall detection, bounded retries, and a
# preemption contract.
#
# Replaces the per-session session_queue*.sh drivers (VERDICT r3 hygiene):
# the queue of record lives in docs/ROADMAP.md; this runner just executes
# one session's worth of it. Usage:
#
#   sh scripts/tpu_queue.sh jobs.txt        # one command per line
#   sh scripts/tpu_queue.sh -- python scripts/pose_protocol.py --recipe pose
#
# Contract (CLAUDE.md): never two TPU jobs concurrently — jobs run strictly
# serially, and anything else touching the TPU must be queued HERE. The
# queue advertises itself in $LOG_DIR/queue.pid (own pid) and
# $LOG_DIR/current_job.pgid (the in-flight job's process group) so a
# higher-priority TPU user can preempt it: bench.py does exactly this at
# startup (SIGTERM here -> the current job's Trainer checkpoints between
# steps and exits -> the queue exits WITHOUT retrying; re-issue the same
# queue command later and the protocol scripts resume from their
# checkpoints / completed-seed artifacts). python children run with -u so
# log mtime reliably reflects liveness during long remote compiles.
#
# Stall detection: a job with no writes to its log, outputs_validation/,
# benchmarks/, or the compile cache for STALL_MIN minutes is killed and
# retried (TRIES total). First attempt gets 2x STALL_MIN: a cold-cache
# remote compile can legitimately stay quiet for many minutes (ADVICE r3).
set -u
cd "$(dirname "$0")/.." || exit 1

STALL_MIN=${STALL_MIN:-30}
TRIES=${TRIES:-3}
LOG_DIR=${LOG_DIR:-/tmp/tpu_queue}
GRACE_S=${GRACE_S:-300}
# Monitor-loop poll; also bounds preemption latency (a trapped TERM is
# serviced only after the in-flight `sleep` completes in POSIX sh).
POLL_S=${POLL_S:-60}
mkdir -p "$LOG_DIR"

# Mutual exclusion (ADVICE r4): a second queue instance would overwrite
# the first's advertisement and its EXIT trap would delete the live
# queue's pid files — letting two TPU jobs run concurrently. Refuse to
# start while another live queue owns the advertisement.
if [ -f "$LOG_DIR/queue.pid" ]; then
    other=$(cat "$LOG_DIR/queue.pid" 2>/dev/null)
    if [ -n "$other" ] && kill -0 "$other" 2>/dev/null; then
        echo "[queue] another queue (pid $other) is live in $LOG_DIR;" \
            "refusing to start (never two TPU jobs — CLAUDE.md)" >&2
        exit 3
    fi
fi
echo $$ >"$LOG_DIR/queue.pid"
# Only the owning pid removes the advertisement (a racing loser's EXIT
# must not clobber the winner's files).
cleanup() {
    [ "$(cat "$LOG_DIR/queue.pid" 2>/dev/null)" = "$$" ] && \
        rm -f "$LOG_DIR/queue.pid" "$LOG_DIR/current_job.pgid"
}
trap cleanup EXIT

CURRENT_PGID=""
on_term() {
    echo "[queue] preempted (TERM/INT): checkpoint-and-exit, no retry"
    # NB: dash's kill builtin rejects `kill -TERM -- "-pgid"` ("Illegal
    # number") — only the `kill -s SIG -- "-pgid"` form reaches the
    # process group under both dash and bash (VERDICT r4 weak #1).
    if [ -n "$CURRENT_PGID" ] && kill -s 0 -- "-$CURRENT_PGID" 2>/dev/null
    then
        kill -s TERM -- "-$CURRENT_PGID" 2>/dev/null
        # The Trainer checkpoints between steps on SIGTERM; give it a
        # bounded grace window (a job blocked in a remote compile cannot
        # service the signal until the compile returns — killing it there
        # loses at most the steps since its last checkpoint). Watch the
        # whole GROUP, not the leader pid: for compound jobs the setsid
        # leader is a `sh -c` wrapper that dies on TERM instantly, and a
        # leader-only wait used to SIGKILL the python child mid-checkpoint.
        w=0
        while kill -s 0 -- "-$CURRENT_PGID" 2>/dev/null \
            && [ "$w" -lt "$GRACE_S" ]; do
            sleep 5
            w=$((w + 5))
        done
        kill -s KILL -- "-$CURRENT_PGID" 2>/dev/null
    fi
    exit 143
}
trap on_term TERM INT

run_job() {
    # $1 = job index, rest = command
    idx=$1; shift
    log="$LOG_DIR/job$idx.log"
    n=0
    while [ "$n" -lt "$TRIES" ]; do
        n=$((n + 1))
        # first (cold-cache) attempt tolerates a longer quiet period
        lim=$STALL_MIN
        [ "$n" -eq 1 ] && lim=$((STALL_MIN * 2))
        echo "[queue] job $idx attempt $n (stall limit ${lim}m): $*" \
            | tee -a "$log"
        # setsid: run the job as its own process-group leader so a stall
        # kill reaches the whole tree (compound job lines like `a && b`
        # spawn children the bare pid wouldn't cover; an earlier `exec`
        # variant silently dropped everything after the first `&&`).
        PYTHONUNBUFFERED=1 setsid "$@" >>"$log" 2>&1 &
        pid=$!
        CURRENT_PGID=$pid
        echo "$pid" >"$LOG_DIR/current_job.pgid"
        while kill -0 "$pid" 2>/dev/null; do
            sleep "$POLL_S"
            fresh=$(find outputs_validation benchmarks /tmp/upnerf_jax_cache \
                "$log" -type f -mmin "-$lim" 2>/dev/null | head -1)
            if [ -z "$fresh" ]; then
                echo "[queue] job $idx: no progress for ${lim}m; killing $pid" \
                    | tee -a "$log"
                kill -s TERM -- "-$pid" 2>/dev/null
                sleep 5
                kill -s KILL -- "-$pid" 2>/dev/null
                break
            fi
        done
        wait "$pid"
        rc=$?
        CURRENT_PGID=""
        rm -f "$LOG_DIR/current_job.pgid"
        if [ "$rc" -eq 0 ]; then
            echo "[queue] job $idx done" | tee -a "$log"
            return 0
        fi
        echo "[queue] job $idx attempt $n exited rc=$rc" | tee -a "$log"
    done
    echo "[queue] job $idx FAILED after $TRIES attempts (log: $log)"
    return 1
}

if [ "${1:-}" = "--" ]; then
    shift
    run_job 0 "$@"
    exit $?
fi

[ $# -eq 1 ] && [ -f "$1" ] || {
    echo "usage: $0 <jobs-file> | $0 -- <command...>" >&2
    exit 2
}

i=0
status=0
while IFS= read -r line; do
    case "$line" in ''|'#'*) continue ;; esac
    i=$((i + 1))
    # shellcheck disable=SC2086 — job lines are trusted shell words
    run_job "$i" sh -c "$line" || status=1
done <"$1"
exit $status
