"""Feature coarse-to-fine schedule (`feat.c2f`, a TPU-native extension
with no reference equivalent — default OFF preserves exact reference
behavior; upnerf/train/step.py gather_feats, state.blur_feat_stack)."""

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.train.state import blur_feat_stack


def _stack(seed=0, n=3, h=12, w=10, c=8):
    rng = np.random.RandomState(seed)
    f = rng.randn(n, h, w, c).astype(np.float32)
    return f / np.linalg.norm(f, axis=-1, keepdims=True)


class TestBlurFeatStack:
    def test_unit_norm_and_shape(self):
        f = _stack()
        g = blur_feat_stack(f, sigma=2.0)
        assert g.shape == f.shape and g.dtype == np.float32
        np.testing.assert_allclose(
            np.linalg.norm(g, axis=-1), 1.0, atol=1e-5
        )

    def test_smooths_spatially(self):
        """Neighbor-difference energy must drop substantially: the whole
        point is a spatially smoother (wider-basin) supervision target."""
        f = _stack()
        g = blur_feat_stack(f, sigma=2.0)

        def neighbor_energy(x):
            return (
                np.abs(np.diff(x, axis=1)).mean()
                + np.abs(np.diff(x, axis=2)).mean()
            )

        assert neighbor_energy(g) < 0.4 * neighbor_energy(f)

    def test_constant_stack_is_fixed_point(self):
        f = np.ones((2, 6, 6, 4), np.float32) / 2.0  # unit-norm constant
        g = blur_feat_stack(f, sigma=1.5)
        np.testing.assert_allclose(g, f, atol=1e-6)


class TestGatherBlend:
    def _scene(self):
        from upnerf.train.state import SceneConstants

        f = _stack(seed=1, n=2, h=8, w=8, c=4)
        coarse = blur_feat_stack(f, 2.0)
        n = 2
        return SceneConstants(
            Ks=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
            poses=jnp.tile(jnp.eye(3, 4)[None], (n, 1, 1)),
            near_far=jnp.tile(jnp.array([[0.5, 4.0]]), (n, 1)),
            wh=jnp.tile(jnp.array([[8, 8]], jnp.int32), (n, 1)),
            feat_maps=jnp.asarray(f),
            feat_maps_coarse=jnp.asarray(coarse),
        )

    def _batch(self):
        return {
            "px": jnp.array([0.0, 3.0, 7.0, 5.0]),
            "py": jnp.array([0.0, 2.0, 7.0, 1.0]),
            "img_idx": jnp.array([0, 1, 0, 1]),
        }

    def test_endpoints_and_midpoint(self):
        from upnerf.train.step import gather_feats

        scene, batch = self._scene(), self._batch()
        plain = gather_feats(scene, batch)
        lo = gather_feats(scene, batch, (0.2, 0.6), jnp.asarray(0.0))
        hi = gather_feats(scene, batch, (0.2, 0.6), jnp.asarray(0.8))
        mid = gather_feats(scene, batch, (0.2, 0.6), jnp.asarray(0.4))
        # past the window: exactly the plain full-res gather
        np.testing.assert_allclose(np.asarray(hi), np.asarray(plain),
                                   atol=1e-6)
        # before the window: exactly the coarse gather
        coarse_only = gather_feats(
            scene._replace(feat_maps=scene.feat_maps_coarse), batch
        )
        np.testing.assert_allclose(np.asarray(lo), np.asarray(coarse_only),
                                   atol=1e-6)
        # inside: the linear blend
        np.testing.assert_allclose(
            np.asarray(mid),
            0.5 * np.asarray(coarse_only) + 0.5 * np.asarray(plain),
            atol=1e-6,
        )

    def test_off_by_default(self):
        """feat_c2f=None (the default) or a scene without the pyramid
        level must reproduce the plain gather bit-exactly — reference
        behavior unchanged."""
        from upnerf.train.step import gather_feats

        scene, batch = self._scene(), self._batch()
        plain = gather_feats(scene, batch)
        none_cfg = gather_feats(scene, batch, None, jnp.asarray(0.3))
        no_pyramid = gather_feats(
            scene._replace(feat_maps_coarse=None), batch, (0.2, 0.6),
            jnp.asarray(0.3),
        )
        np.testing.assert_array_equal(np.asarray(none_cfg), np.asarray(plain))
        np.testing.assert_array_equal(
            np.asarray(no_pyramid), np.asarray(plain)
        )


def test_e2e_train_with_feat_c2f(tmp_path):
    """Two steps of the real Trainer with the schedule on: the coarse
    stack is built, the step compiles, and the loss is finite."""
    import json
    import os

    from upnerf.cli.train import main as train_main
    from upnerf.config import default
    from upnerf.data import synthetic

    scene = str(tmp_path / "scene")
    synthetic.generate_scene(scene, n_train=3, n_test=1, H=24, W=32,
                             feat_hw=8, feat_dim=8, focal=24.0)
    hp = default()
    hp.update({
        "dataset_name": "custom", "scene_name": "synth", "exp_name": "fc2f",
        "root_dir": scene, "feat_dir": os.path.join(scene, "DINO"),
        "depth_dir": os.path.join(scene, "DPT"),
        "out_dir": str(tmp_path / "out"), "max_steps": 2, "debug": True,
        "phototourism.img_downscale": 1, "phototourism.use_cache": False,
        "nerf.N_samples": 8, "nerf.N_importance": 8, "nerf.feat_dim": 8,
        "nerf.D": 2, "nerf.W": 32, "nerf.skips": [],
        "t_net.feat_dim": 8,
        "train.batch_size": 32, "train.ckpt_interval": 2,
        "train.log_pose_interval": 1,
        "val.log_interval": 10**9, "val.chunk_size": 256,
        "feat.c2f": [0.0, 0.5], "feat.pyramid_sigma": 2.0,
    })
    trainer = train_main(hp)
    assert trainer.scene.feat_maps_coarse is not None
    mfile = os.path.join(str(tmp_path / "out"), "synth", "fc2f",
                         "metrics.jsonl")
    rows = [json.loads(l) for l in open(mfile) if "loss" in l]
    assert rows and all(np.isfinite(r["loss"]) for r in rows)
