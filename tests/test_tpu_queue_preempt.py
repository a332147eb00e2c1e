"""The bench <-> tpu_queue preemption contract.

CLAUDE.md: never two TPU jobs concurrently. scripts/tpu_queue.sh
advertises itself (queue.pid / current_job.pgid) and traps SIGTERM as
checkpoint-and-exit-without-retry; bench.py preempts a live queue at
startup so the driver's round-end measurement never times a contended
chip. These tests drive the real script and the real bench function
across an actual process boundary (no TPU involved — the job under the
queue is a plain `sleep`).
"""

import os
import signal
import subprocess
import time

import pytest

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUEUE = os.path.join(REPO, "scripts", "tpu_queue.sh")


def _wait_for(predicate, timeout=15.0, poll=0.1):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if predicate():
            return True
        time.sleep(poll)
    return False


def _alive(pid):
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    return True


@pytest.fixture
def queue_proc(tmp_path):
    env = dict(os.environ, LOG_DIR=str(tmp_path), POLL_S="1", GRACE_S="10")
    proc = subprocess.Popen(
        ["sh", QUEUE, "--", "sleep", "600"],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        yield proc, tmp_path
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()


def test_preempt_live_queue(queue_proc):
    proc, log_dir = queue_proc
    pidfile = log_dir / "queue.pid"
    jobfile = log_dir / "current_job.pgid"
    assert _wait_for(lambda: pidfile.exists() and jobfile.exists()), \
        "queue never advertised itself"
    assert int(pidfile.read_text()) == proc.pid
    job_pgid = int(jobfile.read_text())
    assert _alive(job_pgid)

    assert bench.preempt_tpu_queue(
        log_dir=str(log_dir), wait_s=30.0, poll_s=0.2) is True

    # checkpoint-and-exit, no retry: rc 143, job group dead, ads removed
    assert proc.wait(timeout=30) == 143
    assert _wait_for(lambda: not _alive(job_pgid), timeout=15)

    # orphan check: the WHOLE process group is gone, not just the leader
    # (the r4 dash kill bug left `sleep` jobs running after rc 143)
    def _group_dead():
        try:
            os.killpg(job_pgid, 0)
        except ProcessLookupError:
            return True
        return False

    assert _wait_for(_group_dead, timeout=15), \
        "job process group left orphaned members after preemption"
    assert not pidfile.exists() and not jobfile.exists()


def test_preempt_noops_without_queue(tmp_path):
    t0 = time.monotonic()
    assert bench.preempt_tpu_queue(log_dir=str(tmp_path)) is False
    assert time.monotonic() - t0 < 1.0


def test_preempt_ignores_stale_pidfile(tmp_path):
    # a pid that existed once but is long gone (reboot wipes /tmp, so the
    # realistic stale case is a dead pid, not a reused one)
    dead = subprocess.Popen(["true"])
    dead.wait()
    (tmp_path / "queue.pid").write_text(str(dead.pid))
    assert bench.preempt_tpu_queue(log_dir=str(tmp_path)) is False


def test_preempt_compound_job_grace_covers_children(tmp_path):
    """Compound jobs (`sh -c 'a; b'`) are led by a wrapper sh that dies on
    TERM instantly; the grace wait must watch the whole GROUP or the
    python child gets SIGKILLed mid-checkpoint (caught live in round 5:
    a preempted training run lost 4.6k steps past its last ckpt)."""
    marker = tmp_path / "checkpointed"
    ready = tmp_path / "ready"
    inner = tmp_path / "inner.py"
    inner.write_text(
        "import signal, sys, time\n"
        "def h(s, f):\n"
        "    time.sleep(3)\n"  # stands in for checkpoint-save latency
        f"    open({str(marker)!r}, 'w').write('ok')\n"
        "    sys.exit(0)\n"
        "signal.signal(signal.SIGTERM, h)\n"
        f"open({str(ready)!r}, 'w').write('up')\n"
        "time.sleep(600)\n"
    )
    env = dict(os.environ, LOG_DIR=str(tmp_path), POLL_S="1", GRACE_S="20")
    proc = subprocess.Popen(
        # `; true` keeps the wrapper sh alive as group leader (a single
        # command would be exec'd, hiding the leader-death race); -S skips
        # the (slow) sitecustomize so the handler installs promptly
        ["sh", QUEUE, "--", "sh", "-c", f"python3 -S {inner}; true"],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        assert _wait_for(lambda: ready.exists(), timeout=30), \
            "job never came up"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=40) == 143
        assert marker.exists(), (
            "child was killed before finishing its TERM handler — grace "
            "window did not cover the process group"
        )
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_preempt_treats_zombie_queue_as_dead(tmp_path):
    # A queue whose parent never reaped it passes os.kill(pid, 0) but holds
    # no TPU; bench must not wait the full window then SIGKILL a corpse.
    zombie = subprocess.Popen(["true"])
    assert _wait_for(
        lambda: open(f"/proc/{zombie.pid}/stat", "rb").read()
        .rsplit(b")", 1)[1].split()[0] == b"Z"
    ), "child never became a zombie"
    (tmp_path / "queue.pid").write_text(str(zombie.pid))
    t0 = time.monotonic()
    assert bench.preempt_tpu_queue(
        log_dir=str(tmp_path), wait_s=30.0) is False
    assert time.monotonic() - t0 < 1.0
    zombie.wait()


def test_preempt_skips_when_bench_is_the_current_job(tmp_path):
    # Self-preemption guard: when bench runs AS the queue's job, its own
    # process group is advertised in current_job.pgid — preempting would
    # SIGKILL bench itself mid-run.
    sentinel = subprocess.Popen(["sleep", "30"])  # stands in for the queue
    try:
        (tmp_path / "queue.pid").write_text(str(sentinel.pid))
        (tmp_path / "current_job.pgid").write_text(str(os.getpgrp()))
        assert bench.preempt_tpu_queue(
            log_dir=str(tmp_path), wait_s=5.0) is False
        assert _alive(sentinel.pid), "guard must not signal the queue"
    finally:
        sentinel.kill()
        sentinel.wait()


def test_second_queue_refuses_while_first_is_live(queue_proc):
    proc, log_dir = queue_proc
    pidfile = log_dir / "queue.pid"
    assert _wait_for(lambda: pidfile.exists())
    second = subprocess.run(
        ["sh", QUEUE, "--", "true"],
        cwd=REPO, env=dict(os.environ, LOG_DIR=str(log_dir)),
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, timeout=60,
    )
    assert second.returncode == 3
    assert b"refusing to start" in second.stderr
    # the loser's EXIT trap must not clobber the live queue's advertisement
    assert pidfile.exists() and int(pidfile.read_text()) == proc.pid


def test_queue_clears_ads_on_normal_exit(tmp_path):
    env = dict(os.environ, LOG_DIR=str(tmp_path), POLL_S="1")
    rc = subprocess.run(
        ["sh", QUEUE, "--", "true"], cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=60,
    ).returncode
    assert rc == 0
    assert not (tmp_path / "queue.pid").exists()
    assert not (tmp_path / "current_job.pgid").exists()
