"""Multi-controller smoke WORKER: one process of an N-process CPU cluster.

Spawned by tests/test_multiprocess.py (not collected by pytest — no test_
prefix). Each process owns 4 virtual CPU devices (XLA_FLAGS set by the
parent); together they form the 8-device global data mesh. The worker
drives the real CLI entry (upnerf.cli.train.main) with `dist.*` keys — the
exact multi-host launch a user performs, one process per host
(docs/DESIGN.md "Sharding story") — then writes a digest of its final
replicated state so the parent can assert cross-process consistency and
parity with a single-process run of the same mesh size.
"""

import json
import os
import sys


def build_hp(scene_dir: str, out_dir: str, max_steps: int = 12):
    """Tiny-but-complete training config on the synthetic custom scene
    (shared between the workers and the parent's single-process run)."""
    from upnerf.config import default

    hp = default()
    hp.update(
        {
            "dataset_name": "custom",
            "scene_name": "toy",
            "exp_name": "mp",
            "root_dir": scene_dir,
            "feat_dir": os.path.join(scene_dir, "DINO"),
            "depth_dir": os.path.join(scene_dir, "DPT"),
            "out_dir": out_dir,
            "max_steps": max_steps,
            "debug": True,
            "phototourism.img_downscale": 1,
            "phototourism.use_cache": False,
            "nerf.D": 2,
            "nerf.W": 32,
            "nerf.skips": (1,),
            "nerf.N_samples": 8,
            "nerf.N_importance": 4,
            "nerf.N_emb_xyz": 4,
            "nerf.N_emb_dir": 2,
            "nerf.appearance_dim": 8,
            "nerf.candidate_dim": 4,
            "nerf.feat_dim": 8,
            "t_net.feat_dim": 8,
            "t_net.transient_dim": 8,
            "train.batch_size": 64,
            "train.ckpt_interval": 100,
            "train.log_pose_interval": 0,
            "val.log_interval": 10,
            "val.chunk_size": 128,
            "tpu.matmul_precision": "float32",
            "tpu.donate_state": False,
        }
    )
    return hp


def state_digest(state):
    """Order-stable scalar digests of every param/pose leaf."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(
        {"params": state.params, "pose": state.pose_params}
    )
    return {
        "step": int(state.step),
        "sums": [float(np.float64(np.asarray(x).sum())) for x in leaves],
    }


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    scene_dir = sys.argv[4]
    out_dir = sys.argv[5]
    streaming = len(sys.argv) > 6 and sys.argv[6] == "streaming"

    import jax

    # The axon sitecustomize can force-register a remote TPU backend from
    # the environment; the config update wins (tests/conftest.py note).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    hp = build_hp(scene_dir, out_dir)
    hp.update(
        {
            "dist.coordinator": f"127.0.0.1:{port}",
            "dist.num_processes": nproc,
            "dist.process_id": pid,
            # oversubscribed 1-core box: a peer can take minutes past the
            # 300 s default to reach the gloo barrier under contention
            "dist.init_timeout": 1800,
        }
    )
    if streaming:
        hp["tpu.store_on_device"] = False
        hp["exp_name"] = "mp_streaming"

    from upnerf.cli.train import main as train_main

    trainer = train_main(hp)
    assert jax.process_count() == nproc, jax.process_count()
    assert trainer.multiprocess and trainer.mesh.devices.size == 4 * nproc

    digest = state_digest(trainer.state)
    with open(os.path.join(out_dir, f"digest_{pid}.json"), "w") as f:
        json.dump(digest, f)


if __name__ == "__main__":
    main()
