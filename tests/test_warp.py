"""Pose-warp (basin-stall) detection + multistart mitigation
(upnerf/train/warp.py; no reference equivalent — the reference trains
straight through a stalled basin, docs/DESIGN.md "TTO-success benchmark"
seed 777).

Covers: the per-image loss accumulation in the step metrics (including
shard_map consistency on the virtual mesh), the EMA-ratio detector's
flag/window/cooldown logic, the coarse-PE candidate scorer ranking the
true pose above a warped one on a world-consistent feature target, the
full multistart adoption path, and the Trainer wiring end-to-end.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.train.warp import (
    WarpConfig,
    WarpDetector,
    make_pose_scorer,
    propose_candidates,
    reset_opt_rows,
    run_multistart,
)


class TestDetector:
    def test_flags_sustained_outlier_only(self):
        cfg = WarpConfig(ratio=2.0, patience=3, decay=0.0,
                         min_progress=0.0, max_progress=1.0)
        det = WarpDetector(4, cfg)
        cnt = np.full(4, 10.0)
        good = np.array([1.0, 1.1, 0.9, 1.0]) * 10
        bad = np.array([1.0, 1.1, 0.9, 5.0]) * 10
        assert not det.update(good, cnt, 0.5).any()
        # two bad checks: streak below patience
        assert not det.update(bad, cnt, 0.5).any()
        assert not det.update(bad, cnt, 0.5).any()
        flags = det.update(bad, cnt, 0.5)
        assert flags.tolist() == [False, False, False, True]
        # recovery resets the streak
        assert not det.update(good, cnt, 0.5).any()
        assert not det.update(bad, cnt, 0.5).any()

    def test_window_and_cooldown(self):
        cfg = WarpConfig(ratio=2.0, patience=1, decay=0.0,
                         min_progress=0.4, max_progress=0.6, cooldown=2)
        det = WarpDetector(3, cfg)
        cnt = np.full(3, 4.0)
        bad = np.array([1.0, 1.0, 9.0])
        assert not det.update(bad, cnt, 0.2).any(), "before window"
        assert det.update(bad, cnt, 0.5).any(), "inside window"
        det.start_cooldown()
        assert not det.update(bad, cnt, 0.5).any(), "cooldown check 1"
        assert not det.update(bad, cnt, 0.5).any(), "cooldown check 2"
        assert det.update(bad, cnt, 0.5).any(), "cooldown expired"
        assert not det.update(bad, cnt, 0.95).any(), "after window"

    def test_unsampled_images_keep_ema(self):
        cfg = WarpConfig(ratio=2.0, patience=1, decay=0.0,
                         min_progress=0.0, max_progress=1.0)
        det = WarpDetector(3, cfg)
        s = np.array([1.0, 1.0, 9.0])
        c = np.array([1.0, 1.0, 1.0])
        det.update(s, c, 0.5)
        ema_before = det.ema.copy()
        det.update(np.array([1.0, 1.0, 0.0]), np.array([1.0, 1.0, 0.0]), 0.5)
        assert det.ema[2] == ema_before[2], "unsampled image EMA changed"

    def test_event_budget(self):
        cfg = WarpConfig(max_events=2)
        det = WarpDetector(2, cfg)
        assert det.budget_left
        det.start_cooldown()
        det.start_cooldown()
        assert not det.budget_left


def _tiny_setup(n_images=2, H=16, W=16, batch_size=64):
    from __graft_entry__ import _build
    from upnerf.models import NeRFConfig, TransientConfig
    from upnerf.render import RenderConfig

    nerf_cfg = NeRFConfig(
        D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
        appearance_dim=8, candidate_dim=4, c2f=None,
    )
    t_cfg = TransientConfig(beta_min=0.1, transient_dim=8, feat_dim=8)
    rcfg = RenderConfig(
        N_samples=8, N_importance=4, encode_feat=True, precision="float32"
    )
    return _build(
        n_images=n_images, H=H, W=W, fh=H, fw=W,
        nerf_cfg=nerf_cfg, t_cfg=t_cfg, rcfg=rcfg, batch_size=batch_size,
    )


class TestPerImageMetrics:
    def test_sums_counts_and_total(self):
        from upnerf.train import make_train_step
        from upnerf.train.step import gather_batch

        cfg, scene, store, state, opt, pose_opt = _tiny_setup()
        _, batch_step = make_train_step(cfg, opt, pose_opt)
        idx = jnp.arange(cfg.batch_size)
        batch = gather_batch(store, idx)
        _, metrics = batch_step(state, scene, batch, 0)
        n_img = scene.poses.shape[0]
        s = np.asarray(metrics["img_loss_sum"])
        c = np.asarray(metrics["img_loss_cnt"])
        assert s.shape == (n_img,) and c.shape == (n_img,)
        np.testing.assert_array_equal(
            c, np.bincount(np.asarray(batch["img_idx"]), minlength=n_img)
        )
        # phase 0: sched_mult = 0, so the batch-mean of the per-ray feature
        # term IS loss/l_feat_f
        np.testing.assert_allclose(
            s.sum() / c.sum(), float(metrics["loss/l_feat_f"]), rtol=1e-5
        )

    def test_shard_map_preserves_ratio(self):
        from upnerf.parallel import make_mesh
        from upnerf.train import make_train_step
        from upnerf.train.step import gather_batch

        cfg, scene, store, state, opt, pose_opt = _tiny_setup()
        mesh = make_mesh()
        _, step_ref = make_train_step(cfg, opt, pose_opt)
        _, step_sh = make_train_step(cfg, opt, pose_opt, mesh=mesh)
        batch = gather_batch(store, jnp.arange(cfg.batch_size))
        _, m_ref = step_ref(state, scene, batch, 0)
        _, m_sh = step_sh(state, scene, batch, 0)
        # pmean divides sum and count alike; the per-image mean must match
        mean_ref = np.asarray(m_ref["img_loss_sum"]) / np.maximum(
            np.asarray(m_ref["img_loss_cnt"]), 1
        )
        mean_sh = np.asarray(m_sh["img_loss_sum"]) / np.maximum(
            np.asarray(m_sh["img_loss_cnt"]), 1
        )
        np.testing.assert_allclose(mean_sh, mean_ref, rtol=1e-4)


def _world_consistent_feat_target(cfg, scene, state, img_i, H, W,
                                  score_progress):
    """Render the model's OWN feature field from image img_i's base pose
    onto the full pixel grid and store it as that image's feature map —
    making the base pose the global optimum of the scoring objective."""
    from upnerf.geometry import rays as ray_utils
    from upnerf.render import render_rays

    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = jnp.asarray(ii.ravel(), jnp.float32)
    py = jnp.asarray(jj.ravel(), jnp.float32)
    B = H * W
    img_idx = jnp.full((B,), img_i, jnp.int32)
    K = jnp.broadcast_to(scene.Ks[img_i], (B, 3, 3))
    dirs = ray_utils.pixel_directions(px, py, K)
    rays_o, rays_d = ray_utils.get_rays(
        dirs, jnp.broadcast_to(scene.poses[img_i], (B, 3, 4))
    )
    near_far = jnp.broadcast_to(scene.near_far[img_i], (B, 2))
    rays = jnp.concatenate([rays_o, rays_d, near_far], -1)
    rp = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params.get("nerf_fine"),
        "embeddings": state.params["embeddings"],
    }
    out = render_rays(
        rp, cfg.render._replace(perturb=0.0), cfg.nerf, rays, img_idx,
        key=None, phase=0, sched_mult=jnp.asarray(0.0),
        progress=jnp.asarray(score_progress, jnp.float32), det=True,
    )
    feat = np.asarray(out["feat_fine"]).reshape(H, W, -1)
    maps = np.array(scene.feat_maps, np.float32)  # writable copy
    maps[img_i] = feat
    return scene._replace(feat_maps=jnp.asarray(maps, scene.feat_maps.dtype))


class TestMultistart:
    SCORE_PROGRESS = 0.5

    @pytest.fixture(scope="class")
    def setup(self):
        H = W = 16
        cfg, scene, store, state, opt, pose_opt = _tiny_setup(H=H, W=W)
        # feat maps bf16 in _build -> use f32 for exact targets
        scene = scene._replace(
            feat_maps=scene.feat_maps.astype(jnp.float32)
        )
        scene = _world_consistent_feat_target(
            cfg, scene, state, 0, H, W, self.SCORE_PROGRESS
        )
        return cfg, scene, state

    def test_scorer_ranks_true_pose_first(self, setup):
        cfg, scene, state = setup
        scorer = make_pose_scorer(cfg, 256, self.SCORE_PROGRESS)
        rng = np.random.RandomState(0)
        px = jnp.asarray(rng.randint(0, 16, 256), jnp.float32)
        py = jnp.asarray(rng.randint(0, 16, 256), jnp.float32)
        warped = np.array([0.3, 0.2, -0.3, 0.1, -0.1, 0.2], np.float32)
        cands = jnp.asarray(np.stack([np.zeros(6, np.float32), warped]))
        scores = np.asarray(
            scorer(state.params, scene, jnp.asarray(0, jnp.int32),
                   px, py, cands)
        )
        assert scores[0] < scores[1] * 0.5, scores

    def test_run_multistart_adopts_reset(self, setup):
        cfg, scene, state = setup
        wcfg = WarpConfig(kicks=4, score_rays=256,
                          score_progress=self.SCORE_PROGRESS)
        scorer = make_pose_scorer(cfg, wcfg.score_rays, wcfg.score_progress)
        # image 0's incumbent refinement is a warp; base reset is the optimum
        tab = np.zeros((2, 6), np.float32)
        tab[0] = [0.3, 0.2, -0.3, 0.1, -0.1, 0.2]
        flags = np.array([True, False])
        wh = np.asarray(scene.wh)
        new_tab, adopted = run_multistart(
            scorer, state.params, scene, tab, flags, wh, wcfg,
            np.random.RandomState(1), log=lambda *a, **k: None,
        )
        assert adopted.tolist() == [0]
        # the adopted row must score no worse than the base reset (a kick
        # around base can legitimately edge it out)
        np.testing.assert_array_equal(new_tab[1], tab[1])
        assert np.abs(new_tab[0]).max() < np.abs(tab[0]).max()

    def test_candidates_and_opt_reset(self):
        wcfg = WarpConfig(kicks=6)
        cur = np.array([1, 2, 3, 4, 5, 6.0])
        cands = propose_candidates(cur, wcfg, np.random.RandomState(0))
        assert cands.shape == (8, 6)
        np.testing.assert_array_equal(cands[0], cur)
        np.testing.assert_array_equal(cands[1], np.zeros(6))

        import optax

        opt = optax.adam(1e-3)
        params = {"se3": jnp.ones((4, 6)), "depth_scale": jnp.ones((4, 2))}
        st = opt.init(params)
        # give the moments nonzero values
        g = jax.tree.map(jnp.ones_like, params)
        _, st = opt.update(g, st, params)
        st2 = reset_opt_rows(st, np.array([1, 3]), (4, 6))
        mus = [l for l in jax.tree.leaves(st2)
               if hasattr(l, "shape") and l.shape == (4, 6)]
        assert mus, "no se3-shaped moment leaves found"
        for m in mus:
            arr = np.asarray(m)
            assert (arr[[1, 3]] == 0).all()
            assert (arr[[0, 2]] != 0).any()
        # depth_scale moments untouched
        ds = [np.asarray(l) for l in jax.tree.leaves(st2)
              if hasattr(l, "shape") and l.shape == (4, 2)]
        for m in ds:
            assert (m != 0).any()


class TestTrainerWiring:
    @staticmethod
    def _toy_hp(tmp_path):
        from upnerf.config import default
        from upnerf.data import synthetic

        scene_dir = str(tmp_path / "scene")
        synthetic.generate_scene(
            scene_dir, n_train=3, n_test=1, H=20, W=24, feat_hw=6,
            feat_dim=8,
        )
        hp = default()
        hp.update({
            "dataset_name": "custom", "scene_name": "toy",
            "exp_name": "warp", "root_dir": scene_dir,
            "feat_dir": os.path.join(scene_dir, "DINO"),
            "depth_dir": os.path.join(scene_dir, "DPT"),
            "out_dir": str(tmp_path / "out"),
            "max_steps": 40, "debug": True,
            "phototourism.img_downscale": 1,
            "phototourism.use_cache": False,
            "nerf.D": 2, "nerf.W": 32, "nerf.skips": (1,),
            "nerf.N_samples": 8, "nerf.N_importance": 4,
            "nerf.appearance_dim": 8, "nerf.candidate_dim": 4,
            "nerf.feat_dim": 8, "t_net.feat_dim": 8,
            "t_net.transient_dim": 8,
            "train.batch_size": 64, "train.ckpt_interval": 100,
            "train.log_pose_interval": 100,
            "val.log_interval": 100, "val.chunk_size": 128,
            "tpu.matmul_precision": "float32",
            # hair-trigger detector: any image marginally above median
            # flags on the first check; mitigation on, tiny scorer
            "pose.warp.detect": True,
            "pose.warp.ratio": 1.0001,
            "pose.warp.patience": 1,
            "pose.warp.decay": 0.0,
            "pose.warp.min_progress": 0.0,
            "pose.warp.max_progress": 1.0,
            "pose.warp.mitigate": "multistart",
            "pose.warp.kicks": 2,
            "pose.warp.score_rays": 64,
            "pose.warp.max_events": 1,
            "pose.warp.cooldown": 1,
        })
        return hp

    def test_detection_and_mitigation_fire(self, tmp_path):
        """Force-sensitive detector on a tiny real Trainer run: flags fire,
        a multistart event executes, logs land, budget is respected."""
        from upnerf.train.loop import Trainer

        hp = self._toy_hp(tmp_path)
        trainer = Trainer(hp)
        trainer.fit(log_every=10)
        assert trainer._warp is not None
        assert trainer._warp.events == 1, "mitigation event did not fire"
        assert not trainer._warp.budget_left

        import json

        mfile = os.path.join(trainer.save_dir, "metrics.jsonl")
        rows = [json.loads(l) for l in open(mfile)]
        assert any("train/warp_flagged" in r for r in rows)
        # state stayed trainable after the event
        losses = [r["loss"] for r in rows if "loss" in r]
        assert np.isfinite(losses[-1])

    def test_reset_mitigation_zeroes_flagged_rows(self, tmp_path):
        """mitigate=reset: the event force-adopts base poses for every
        flagged row (no scoring — the collective-warp lever), zeroes the
        adopted rows' se3 refinements at event time, and training
        continues finite."""
        import json

        from upnerf.train.loop import Trainer

        hp = self._toy_hp(tmp_path)
        hp.update({
            "pose.warp.mitigate": "reset",
            # give poses time to drift off zero before the (hair-trigger)
            # detector fires so the reset is observable
            "pose.warp.min_progress": 0.5,
        })
        trainer = Trainer(hp)
        trainer.fit(log_every=10)
        assert trainer._warp.events == 1, "reset event did not fire"

        mfile = os.path.join(trainer.save_dir, "metrics.jsonl")
        rows = [json.loads(l) for l in open(mfile)]
        ev = [r for r in rows if "train/warp_event" in r]
        # reset adopts EVERY flagged row (multistart may adopt none)
        assert ev and ev[0]["train/warp_event"] >= 1
        losses = [r["loss"] for r in rows if "loss" in r]
        assert np.isfinite(losses[-1])
