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


def test_queue_clears_ads_on_normal_exit(tmp_path):
    env = dict(os.environ, LOG_DIR=str(tmp_path), POLL_S="1")
    rc = subprocess.run(
        ["sh", QUEUE, "--", "true"], cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=60,
    ).returncode
    assert rc == 0
    assert not (tmp_path / "queue.pid").exists()
    assert not (tmp_path / "current_job.pgid").exists()
