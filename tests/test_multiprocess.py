"""Multi-controller (multi-host) smoke: REAL process boundaries.

The single-process 8-device mesh tests validate the SPMD programs; this
suite validates the multi-controller runtime around them — the TPU-native
replacement for the reference's DDP launch (train.py:70-72): two OS
processes, 4 virtual CPU devices each, gloo collectives, one global
8-device data mesh, orbax checkpoint coordination, process-0 IO gating.

Covers:
- the `dist.*` CLI keys end-to-end (upnerf.cli.train.main) on the
  device-resident path: both processes converge to bit-identical states,
  and that state matches a single-process run over the same 8-device mesh;
- the host-streaming path (per-process prefetchers feeding local shards of
  the global batch): cross-process consistency + finite loss.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mp_worker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_cluster(tmp_path, scene_dir, out_dir, mode=None, nproc=2):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)  # CLAUDE.md: shadows the axon plugin
    port = _free_port()
    procs, logs = [], []
    for pid in range(nproc):
        log = open(tmp_path / f"worker{pid}_{mode or 'dev'}.log", "w")
        args = [sys.executable, WORKER, str(pid), str(nproc), str(port),
                scene_dir, str(out_dir)]
        if mode:
            args.append(mode)
        procs.append(
            subprocess.Popen(
                args, env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT
            )
        )
        logs.append(log)
    try:
        for p in procs:
            # generous: two workers share this box's ONE core, and a
            # concurrent TPU-protocol host process (CLAUDE.md serial-TPU
            # queue) can triple the contention — 900 s flaked once there
            p.wait(timeout=2400)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()
    for pid, p in enumerate(procs):
        if p.returncode != 0:
            tail = open(tmp_path / f"worker{pid}_{mode or 'dev'}.log").read()
            raise AssertionError(
                f"worker {pid} rc={p.returncode}\n--- log tail ---\n{tail[-4000:]}"
            )
    digests = []
    for pid in range(nproc):
        with open(os.path.join(out_dir, f"digest_{pid}.json")) as f:
            digests.append(json.load(f))
    return digests


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    from upnerf.data import synthetic

    d = str(tmp_path_factory.mktemp("mp") / "scene")
    synthetic.generate_scene(
        d, n_train=3, n_test=1, H=20, W=24, feat_hw=6, feat_dim=8
    )
    return d


def test_two_process_training_matches_single_process(tmp_path, scene_dir):
    out_mp = tmp_path / "out_mp"
    digests = _launch_cluster(tmp_path, scene_dir, out_mp)

    # both controllers hold the same replicated state, bit-for-bit
    assert digests[0]["step"] == digests[1]["step"] == 12
    assert digests[0]["sums"] == digests[1]["sums"]
    assert np.isfinite(digests[0]["sums"]).all()

    # ... and it matches the same training run on the single-process
    # 8-device mesh (this pytest process): identical global mesh, identical
    # program — only the controller layout differs. Reduction orders can
    # differ across collective implementations, hence the tolerance.
    from upnerf.train.loop import Trainer

    hp = mp_worker.build_hp(scene_dir, str(tmp_path / "out_single"))
    trainer = Trainer(hp)
    state = trainer.fit(log_every=10)
    single = mp_worker.state_digest(state)
    assert single["step"] == digests[0]["step"]
    np.testing.assert_allclose(
        np.asarray(single["sums"]),
        np.asarray(digests[0]["sums"]),
        rtol=2e-4,
        atol=1e-5,
    )

    # process-0 gating: exactly one process wrote the metrics/config files
    run_dir = os.path.join(out_mp, "toy", "mp")
    assert os.path.isfile(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.isfile(os.path.join(run_dir, "config.yaml"))
    # orbax checkpoint written cooperatively and restorable
    assert os.path.isdir(os.path.join(run_dir, "ckpts"))


def test_two_process_streaming_consistency(tmp_path, scene_dir):
    """Host-streaming multiprocess: each process's prefetcher feeds its
    local shard of the global batch (put_local_shards)."""
    out_mp = tmp_path / "out_stream"
    digests = _launch_cluster(tmp_path, scene_dir, out_mp, mode="streaming")
    assert digests[0]["step"] == digests[1]["step"] == 12
    assert digests[0]["sums"] == digests[1]["sums"]
    assert np.isfinite(digests[0]["sums"]).all()
