"""End-to-end smoke: synthetic scene -> Trainer -> checkpoints -> resume.

This is the SURVEY.md §7.2 step-5 "minimum end-to-end slice" as a hermetic
test: tiny model, tiny scene, a few dozen steps on the virtual CPU mesh.
"""

import os

import jax
import numpy as np
import pytest

from upnerf.config import default
from upnerf.data import synthetic


@pytest.fixture(scope="module")
def hp(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    scene_dir = str(root / "scene")
    synthetic.generate_scene(
        scene_dir, n_train=3, n_test=1, H=20, W=24, feat_hw=6, feat_dim=8
    )
    hp = default()
    hp.update(
        {
            "dataset_name": "custom",
            "scene_name": "toy",
            "exp_name": "test",
            "root_dir": scene_dir,
            "feat_dir": os.path.join(scene_dir, "DINO"),
            "depth_dir": os.path.join(scene_dir, "DPT"),
            "out_dir": str(root / "out"),
            "max_steps": 40,
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
            "train.ckpt_interval": 10,
            "train.log_pose_interval": 20,
            "val.log_interval": 15,
            "val.chunk_size": 128,
            "tpu.matmul_precision": "float32",
            "optimizer.lr": 5e-3,
            "optimizer.scheduler.lr_end": 5e-4,
        }
    )
    return hp


def test_trainer_fit_and_resume(hp):
    from upnerf.train.loop import Trainer

    trainer = Trainer(hp)
    state = trainer.fit(log_every=10, max_steps=20)
    assert int(state.step) == 20
    ckpt_dir = os.path.join(hp["out_dir"], "toy", "test", "ckpts")
    assert trainer.ckpt.latest_step() is not None

    metrics_file = os.path.join(hp["out_dir"], "toy", "test", "metrics.jsonl")
    assert os.path.isfile(metrics_file)
    import json

    recs = [json.loads(l) for l in open(metrics_file)]
    losses = [r["loss"] for r in recs if "loss" in r]
    assert len(losses) >= 2 and np.isfinite(losses).all()

    # resume: a new Trainer picks up from the checkpoint
    trainer2 = Trainer(hp)
    state2 = trainer2.fit(log_every=10, max_steps=40)
    assert int(state2.step) == 40
    # pose table kept training (didn't reset)
    assert np.abs(np.asarray(state2.pose_params["se3"])).max() > 0


def test_validate_renders_full_image(hp):
    from upnerf.train.loop import Trainer

    trainer = Trainer(hp)
    if trainer.ckpt.latest_step() is not None:
        trainer.state = trainer.ckpt.restore(trainer.state)
    out, (w, h) = trainer.render_image(0)
    n = w * h
    assert out["s_depth_fine"].shape == (n,)
    val_psnr = trainer.validate(int(trainer.state.step))
    assert np.isfinite(val_psnr)


def test_ckpt_restores_pre_rng_checkpoints(tmp_path, hp):
    """Checkpoints written before the `rng` state field existed must still
    restore (the field falls back to its freshly-initialized value)."""
    import jax
    import jax.numpy as jnp

    from upnerf.train.state import TrainState, build_train_state
    from upnerf.utils.ckpt import CheckpointManager

    state = build_train_state(hp, n_images=3)
    old_style = {f: getattr(state, f) for f in state._fields if f != "rng"}
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save(1, old_style)
    restored = mngr.restore(state)
    mngr.close()
    assert isinstance(restored, TrainState)
    assert restored.rng is not None
    np.testing.assert_array_equal(
        np.asarray(restored.params["embeddings"]["coarse_a"]),
        np.asarray(state.params["embeddings"]["coarse_a"]),
    )


def test_ckpt_retention_keeps_latest_and_best(tmp_path):
    """The LAST checkpoint must always survive even when its val PSNR is
    below the top-k (orbax's best_fn retention deleted a 15k-step run's
    final checkpoint because its val dipped below step 3000's — TTO and
    auto-resume then silently used the stale 9k model)."""
    from upnerf.utils.ckpt import CheckpointManager

    tree = {"x": np.arange(3)}
    mngr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    mngr.save(1, tree, {"val_psnr": 20.0})
    mngr.save(2, tree, {"val_psnr": 25.0})  # best
    mngr.save(3, tree)  # interval save, no metrics: protected while latest
    assert set(mngr._mngr.all_steps()) == {1, 2, 3}
    mngr.save(4, tree, {"val_psnr": 22.0})
    mngr.save(5, tree, {"val_psnr": 18.0})  # final: worse than all prior
    assert mngr.latest_step() == 5
    assert mngr.best_step() == 2
    assert set(mngr._mngr.all_steps()) == {2, 4, 5}
    mngr.close()
    # a fresh manager instance recovers best_step from the journal
    m2 = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    assert m2.best_step() == 2 and m2.latest_step() == 5
    m2.close()


def test_val_downscale_floor(hp):
    """Training at downscale 1 must validate at downscale 2
    (datasets/phototourism.py:53-54)."""
    from upnerf.train.loop import Trainer

    hp2 = dict(hp)
    hp2["exp_name"] = "valfloor"
    trainer = Trainer(hp2)
    assert trainer.val_scale == 2 and trainer.val_data is not None
    out, (w, h) = trainer.render_image(0)
    # val image is half-size of the 20x24 training images
    assert (w, h) == (12, 10)
    assert out["s_depth_fine"].shape == (w * h,)
    val_psnr = trainer.validate(0)
    assert np.isfinite(val_psnr)


class TestDivergenceWatchdog:
    """Non-finite-loss watchdog: restore-with-refolded-rng, bounded retries
    (failure-detection aux subsystem; the reference trains through NaNs)."""

    @staticmethod
    def _nan_step(trainer):
        def step_fn(state, scene, store, phase):
            return state, {"loss": jax.numpy.asarray(float("nan"))}

        return step_fn

    def test_recovers_once_then_continues(self, hp):
        from upnerf.train.loop import Trainer

        hp2 = dict(hp)
        hp2["exp_name"] = "watchdog_recover"
        trainer = Trainer(hp2)
        trainer.fit(log_every=5, max_steps=10)  # checkpoint at step 10
        assert trainer.ckpt.latest_step() == 10

        real_step = trainer.step_fn
        calls = {"n": 0}

        def flaky(state, scene, store, phase):
            calls["n"] += 1
            if calls["n"] <= 5:  # poison the first logged window only
                return state, {"loss": jax.numpy.asarray(float("nan"))}
            return real_step(state, scene, store, phase)

        trainer.step_fn = flaky
        state = trainer.fit(log_every=5, resume=True, max_steps=20)
        assert int(state.step) == 20
        assert trainer._nan_restarts == 1
        # the restart is visible in the metric log
        import json

        metrics_file = os.path.join(
            hp2["out_dir"], "toy", "watchdog_recover", "metrics.jsonl"
        )
        recs = [json.loads(l) for l in open(metrics_file)]
        assert any("train/nonfinite_restart" in r for r in recs)

    def test_aborts_after_budget(self, hp):
        from upnerf.train.loop import Trainer

        hp2 = dict(hp)
        hp2["exp_name"] = "watchdog_abort"
        hp2["train.max_nan_restarts"] = 1
        trainer = Trainer(hp2)
        trainer.fit(log_every=5, max_steps=10)
        trainer.step_fn = self._nan_step(trainer)
        with pytest.raises(FloatingPointError, match="diverges reproducibly"):
            trainer.fit(log_every=5, resume=True, max_steps=20)
        assert trainer._nan_restarts == 2  # budget 1 + the aborting hit

    def test_aborts_without_checkpoint(self, hp):
        from upnerf.train.loop import Trainer

        hp2 = dict(hp)
        hp2["exp_name"] = "watchdog_nockpt"
        trainer = Trainer(hp2)
        trainer.step_fn = self._nan_step(trainer)
        with pytest.raises(FloatingPointError, match="before the first"):
            trainer.fit(log_every=5, max_steps=10)


def test_explicit_resume_ckpt(hp):
    """`resume_ckpt` restarts from another run's checkpoints
    (train.py:34-40); the explicit path wins over auto-resume."""
    from upnerf.train.loop import Trainer

    hp_a = dict(hp)
    hp_a["exp_name"] = "resume_src"
    trainer_a = Trainer(hp_a)
    trainer_a.fit(log_every=10, max_steps=20)
    src_run = os.path.join(hp_a["out_dir"], "toy", "resume_src")
    src_se3 = np.asarray(trainer_a.state.pose_params["se3"])

    # restart a NEW experiment from the source run directory
    hp_b = dict(hp)
    hp_b["exp_name"] = "resume_dst"
    hp_b["resume_ckpt"] = src_run
    trainer_b = Trainer(hp_b)
    state_b = trainer_b.fit(log_every=10, max_steps=30)
    assert int(state_b.step) == 30
    # it really started from the source state (fresh init would be zeros)
    assert np.abs(src_se3).max() > 0
    # and the new run saves its own checkpoints
    assert trainer_b.ckpt.latest_step() == 30

    # a specific step directory also works
    hp_c = dict(hp)
    hp_c["exp_name"] = "resume_dst2"
    hp_c["resume_ckpt"] = os.path.join(src_run, "ckpts", "20")
    trainer_c = Trainer(hp_c)
    trainer_c.fit(log_every=10, max_steps=21)
    assert int(trainer_c.state.step) == 21


def test_profile_capture(hp, tmp_path):
    """train.profile_at captures a device trace into <run>/profile/
    (A1 profiling/tracing; richer than Lightning profiler='simple')."""
    import glob

    from upnerf.train.loop import Trainer

    hp2 = dict(hp)
    hp2.update({
        "exp_name": "profiled",
        "out_dir": str(tmp_path / "out"),
        "train.profile_at": 4,
        "train.profile_steps": 2,
        "max_steps": 8,
    })
    trainer = Trainer(hp2)
    trainer.fit(log_every=100)
    prof_dir = os.path.join(hp2["out_dir"], "toy", "profiled", "profile")
    traces = glob.glob(
        os.path.join(prof_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert traces, f"no trace written under {prof_dir}"
