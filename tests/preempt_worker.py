"""Preemption-smoke WORKER (spawned by tests/test_graceful_shutdown.py,
not collected by pytest): starts an effectively-endless training run; the
parent sends SIGTERM mid-run and asserts a clean checkpointed exit."""

import os
import sys


def main():
    scene_dir, out_dir = sys.argv[1], sys.argv[2]
    max_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from mp_worker import build_hp

    from upnerf.train.loop import Trainer

    hp = build_hp(scene_dir, out_dir, max_steps=max_steps)
    hp.update(
        {
            "exp_name": "preempt",
            # only the preemption handler should write checkpoints
            "train.ckpt_interval": 10**9,
            "val.log_interval": 10**9,
            "train.log_pose_interval": 0,
        }
    )
    trainer = Trainer(hp)
    # log_every=2 -> metrics.jsonl appears within a few steps; the parent
    # uses it as the "training is underway" marker before signalling.
    state = trainer.fit(log_every=2)
    print(f"FINAL_STEP={int(state.step)}", flush=True)


if __name__ == "__main__":
    main()
