"""Preemption-safe shutdown: SIGTERM -> checkpoint -> clean exit -> resume.

TPU-pod preemptions and cluster schedulers deliver SIGTERM with a grace
window; the Trainer flags it in a signal handler, finishes the in-flight
step, checkpoints, and returns (upnerf/train/loop.py). The reference has no
equivalent — Lightning dies wherever it stands and loses everything since
the last ModelCheckpoint cadence. Auto-resume then continues from the
preempted step exactly (train.py:34-40 semantics).
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "preempt_worker.py")


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from upnerf.data import synthetic

    d = str(tmp_path_factory.mktemp("preempt") / "scene")
    synthetic.generate_scene(
        d, n_train=3, n_test=1, H=20, W=24, feat_hw=6, feat_dim=8
    )
    return d


def _spawn(tmp_path, scene_dir, out_dir, tag, max_steps=100_000):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    log = open(tmp_path / f"{tag}.log", "w")
    proc = subprocess.Popen(
        [sys.executable, WORKER, scene_dir, str(out_dir), str(max_steps)],
        env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    )
    return proc, log


def test_sigterm_checkpoints_and_resumes(tmp_path, scene_dir):
    out_dir = tmp_path / "out"
    run_dir = os.path.join(out_dir, "toy", "preempt")
    metrics = os.path.join(run_dir, "metrics.jsonl")

    proc, log = _spawn(tmp_path, scene_dir, out_dir, "preempt")
    try:
        # wait for training to be underway (first metrics line ~ step 2)
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.isfile(metrics) and os.path.getsize(metrics) > 0:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.5)
        assert proc.poll() is None, open(tmp_path / "preempt.log").read()[-3000:]

        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
        log.close()
    out = open(tmp_path / "preempt.log").read()
    assert rc == 0, out[-3000:]
    assert "checkpointed step" in out and "stopped cleanly" in out, out[-3000:]

    from upnerf.utils import CheckpointManager

    mgr = CheckpointManager(os.path.join(run_dir, "ckpts"))
    saved = mgr.latest_step()
    mgr.close()
    assert saved is not None and 0 < saved < 100_000

    # relaunch with a reachable max_steps: auto-resume must pick up at the
    # preempted step and run to completion
    proc2, log2 = _spawn(
        tmp_path, scene_dir, out_dir, "resume", max_steps=saved + 4
    )
    try:
        rc2 = proc2.wait(timeout=600)
    finally:
        if proc2.poll() is None:
            proc2.kill()
        log2.close()
    out2 = open(tmp_path / "resume.log").read()
    assert rc2 == 0, out2[-3000:]
    assert f"resumed from step {saved}" in out2, out2[-3000:]
    assert f"FINAL_STEP={saved + 4}" in out2, out2[-3000:]
