"""TTO: sim(3) test-pose initialization + grouped two-phase optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.evaluate.tto import (
    TTOConfig,
    TTOGroup,
    align_test_poses,
    run_tto_group,
)
from upnerf.geometry import procrustes, se3
from upnerf.models import NeRFConfig, init_nerf
from upnerf.render import RenderConfig


def _centers(parsed):
    """Camera centers of parsed (w2c) poses."""
    c = jnp.zeros((1, 1, 3))
    return np.asarray(se3.cam2world(c, parsed)[:, 0])


def _gauge_parsed(parsed, Q, s, u):
    """Apply a sim(3) gauge in parsed space: c' = s*(c@Q)+u, R' = R@Q —
    the exact family prealign_cameras solves for."""
    R = np.asarray(parsed[..., :3])
    c = _centers(parsed)
    R2 = R @ np.asarray(Q)
    c2 = s * (c @ np.asarray(Q)) + np.asarray(u)
    t2 = -(R2 @ c2[..., None])[..., 0]
    return se3.make_pose(R=jnp.asarray(R2), t=jnp.asarray(t2))


class TestAlignTestPoses:
    def _random_raw(self, key, n, scale=0.5):
        return se3.se3_to_SE3(jax.random.normal(key, (n, 6)) * scale)

    def test_nontrivial_sim3_gauge_recovered_exactly(self):
        """Fabricate a training result whose learned frame differs from GT
        by a KNOWN nontrivial sim(3) (rotation Q, scale s, shift u) and
        check align_test_poses maps held-out GT test poses exactly onto
        their gauged counterparts — rotations AND centers. This pins the
        direction of every transform in the chain (the component SURVEY
        §7.3 ranks 'easy to get subtly wrong'); a single inverted sim3 or
        swapped compose order fails it."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        gt_train_raw = self._random_raw(k1, 12)
        gt_test_raw = self._random_raw(k2, 4)

        Q = np.asarray(se3.so3_to_SO3(jnp.asarray([0.3, -0.5, 0.2])))
        s, u = 1.7, np.array([0.4, -0.3, 0.2], np.float32)

        # Learned parsed train poses = gauged parsed GT train poses.
        gt_train_parsed = procrustes.parse_raw_camera(gt_train_raw)
        learned_parsed = _gauge_parsed(gt_train_parsed, Q, s, u)
        # parse_raw_camera is an involution: raw learned poses.
        learned_raw = procrustes.parse_raw_camera(learned_parsed)
        # Training composes pose = base o exp(se3) with base = identity, so
        # the table is just the log of the learned raw poses.
        se3_table = np.asarray(se3.SE3_to_se3(learned_raw))

        out_raw = align_test_poses(
            se3_table, np.asarray(gt_train_raw), np.asarray(gt_test_raw)
        )
        out_parsed = procrustes.parse_raw_camera(jnp.asarray(out_raw))
        expect_parsed = _gauge_parsed(
            procrustes.parse_raw_camera(gt_test_raw), Q, s, u
        )
        np.testing.assert_allclose(
            np.asarray(out_parsed[..., :3]),
            np.asarray(expect_parsed[..., :3]), atol=2e-3,
        )
        np.testing.assert_allclose(
            _centers(out_parsed), _centers(expect_parsed), atol=5e-3
        )

    def test_noised_base_poses_honored(self):
        """With pose.noise training (base != identity) the learned pose is
        base o exp(se3); align_test_poses must compose with the TRUE base
        (the reference hard-codes identity, which this test would fail)."""
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(11), 3)
        gt_train_raw = self._random_raw(k1, 12)
        gt_test_raw = self._random_raw(k2, 4)
        base_raw = self._random_raw(k3, 12, scale=0.2)

        Q = np.asarray(se3.so3_to_SO3(jnp.asarray([-0.2, 0.4, 0.1])))
        s, u = 0.8, np.array([-0.1, 0.25, 0.15], np.float32)
        gt_train_parsed = procrustes.parse_raw_camera(gt_train_raw)
        learned_parsed = _gauge_parsed(gt_train_parsed, Q, s, u)
        learned_raw = procrustes.parse_raw_camera(learned_parsed)
        # learned = base o refine  =>  refine = base^-1 o learned
        refine = se3.compose_pair(learned_raw, se3.invert(base_raw))
        se3_table = np.asarray(se3.SE3_to_se3(refine))

        out_raw = align_test_poses(
            se3_table, np.asarray(gt_train_raw), np.asarray(gt_test_raw),
            base_train_poses=np.asarray(base_raw),
        )
        out_parsed = procrustes.parse_raw_camera(jnp.asarray(out_raw))
        expect_parsed = _gauge_parsed(
            procrustes.parse_raw_camera(gt_test_raw), Q, s, u
        )
        np.testing.assert_allclose(
            np.asarray(out_parsed[..., :3]),
            np.asarray(expect_parsed[..., :3]), atol=2e-3,
        )
        np.testing.assert_allclose(
            _centers(out_parsed), _centers(expect_parsed), atol=5e-3
        )

    def test_planar_rig_gauge_recovered(self):
        """Cameras on a planar ring (every synthetic testbed here; any real
        scene shot at one height). The center covariance is rank-2, so the
        reference's center-only Procrustes can return a reflected ~180-deg
        gauge rotation (observed 179.3 deg on the tto_quality run -> 12 dB
        post-TTO renders). The orientation-based estimator (default) must
        recover the true gauge exactly; this is the regression test for
        that failure."""
        from upnerf.data.synthetic import _camera_ring

        ring = jnp.asarray(_camera_ring(16, arc=0.5))  # planar: y fixed
        gt_train_raw, gt_test_raw = ring[:12], ring[12:]

        Q = np.asarray(se3.so3_to_SO3(jnp.asarray([0.05, -0.1, 0.04])))
        s, u = 1.2, np.array([0.1, -0.05, 0.2], np.float32)
        gt_train_parsed = procrustes.parse_raw_camera(gt_train_raw)
        learned_parsed = _gauge_parsed(gt_train_parsed, Q, s, u)
        learned_raw = procrustes.parse_raw_camera(learned_parsed)
        se3_table = np.asarray(se3.SE3_to_se3(learned_raw))

        out_raw = align_test_poses(
            se3_table, np.asarray(gt_train_raw), np.asarray(gt_test_raw)
        )
        out_parsed = procrustes.parse_raw_camera(jnp.asarray(out_raw))
        expect_parsed = _gauge_parsed(
            procrustes.parse_raw_camera(gt_test_raw), Q, s, u
        )
        R_err = np.degrees(np.asarray(procrustes.rotation_distance(
            out_parsed[..., :3], expect_parsed[..., :3])))
        assert R_err.max() < 0.5, R_err
        np.testing.assert_allclose(
            _centers(out_parsed), _centers(expect_parsed), atol=5e-3
        )

    def test_perfect_training_recovers_gt_frame(self):
        """If the refined train poses exactly equal the parsed GT poses (in
        some sim3 frame), aligned test poses must land on their GT parsed
        counterparts mapped into that frame; check self-consistency by
        running the train poses through the test path."""
        rng = jax.random.PRNGKey(0)
        gt = se3.se3_to_SE3(jax.random.normal(rng, (12, 6)) * 0.3)
        gt = np.asarray(gt)
        # Fabricate a training result: se3 table whose exp composed with
        # identity equals parse_raw_camera-consistent transforms of gt.
        # Instead of inverting parse_raw_camera analytically, feed the GT
        # train poses as BOTH the se3-refined result and the alignment
        # target: refine = log(parse^-1 ... ) is unnecessary — use the
        # identity-refinement case where train refinement equals the parsed
        # gt directly.
        # Simpler invariant: aligning the TRAIN set through the test-pose
        # path must reproduce prealigned train poses up to the sim3.
        se3_table = np.asarray(
            se3.SE3_to_se3(jnp.asarray(gt))
        )  # refined posed = exp(se3) o I = gt
        aligned_train_as_test = align_test_poses(se3_table, gt, gt)
        # The camera centers of the aligned "test" poses must match the
        # centers of the refined (=gt) parsed poses.
        refined = procrustes.parse_raw_camera(
            se3.compose(
                [se3.se3_to_SE3(jnp.asarray(se3_table)),
                 jnp.broadcast_to(jnp.eye(3, 4), (12, 3, 4))]
            )
        )
        aligned_parsed = procrustes.parse_raw_camera(
            jnp.asarray(aligned_train_as_test)
        )
        c = jnp.zeros((1, 1, 3))
        c_ref = np.asarray(se3.cam2world(c, refined)[:, 0])
        c_ali = np.asarray(se3.cam2world(c, aligned_parsed)[:, 0])
        np.testing.assert_allclose(c_ali, c_ref, atol=5e-3)


@pytest.mark.slow
class TestRunTTO:
    def test_two_phase_improves_psnr(self):
        nerf_cfg = NeRFConfig(
            D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=None,
        )
        cfg = TTOConfig(
            nerf=nerf_cfg,
            render=RenderConfig(
                N_samples=8, N_importance=4, perturb=1.0, precision="float32"
            ),
            batch_size=64,
            pose_epochs=2,
            appearance_epochs=2,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        frozen = {
            "nerf_coarse": init_nerf(ks[0], nerf_cfg),
            "nerf_fine": init_nerf(ks[1], nerf_cfg),
            "embeddings": {
                "coarse_a": jax.random.normal(ks[2], (3, 8)),
                "fine_a": jax.random.normal(ks[3], (3, 8)),
                "coarse_c": jax.random.normal(ks[4], (3, 4)),
                "fine_c": jax.random.normal(ks[5], (3, 4)),
            },
        }
        G, H, W = 2, 12, 16
        Ks = np.zeros((G, 3, 3), np.float32)
        Ks[:, 0, 0] = Ks[:, 1, 1] = 15.0
        Ks[:, 0, 2] = W / 2
        Ks[:, 1, 2] = H / 2
        Ks[:, 2, 2] = 1
        rng = np.random.RandomState(0)
        group = TTOGroup(
            Ks=jnp.asarray(Ks),
            base_poses=jnp.broadcast_to(jnp.eye(3, 4), (G, 3, 4)),
            rgbs=jnp.asarray(rng.randint(0, 255, (G, H, W, 3)), jnp.uint8),
            wh=jnp.asarray([[W, H]] * G, jnp.int32),
            near_far=jnp.tile(jnp.array([[0.5, 4.0]]), (G, 1)),
        )
        out = run_tto_group(
            frozen, cfg, group, appearance_dim=8, key=jax.random.PRNGKey(1),
            log=lambda *a, **k: None,
        )
        assert out["psnr"].shape == (G,)
        assert np.isfinite(out["psnr"]).all()
        assert out["pose"].shape == (G, 3, 4)
        assert np.isfinite(out["ssim"]).all()


class TestRunnerCompilesOnce:
    def test_heterogeneous_groups_share_compiled_programs(self):
        """Two groups with different true image sizes (same padded shapes)
        must run through ONE compiled step and ONE compiled eval per phase
        (round 1 rebuilt the jit closures per group — VERDICT r1 #7)."""
        from upnerf.evaluate.tto import TTORunner, tto_region_size

        nerf_cfg = NeRFConfig(
            D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=None,
        )
        cfg = TTOConfig(
            nerf=nerf_cfg,
            render=RenderConfig(
                N_samples=8, N_importance=4, perturb=1.0, precision="float32"
            ),
            batch_size=32,
            pose_epochs=1,
            appearance_epochs=1,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        frozen = {
            "nerf_coarse": init_nerf(ks[0], nerf_cfg),
            "nerf_fine": init_nerf(ks[1], nerf_cfg),
            "embeddings": {
                "coarse_a": jax.random.normal(ks[2], (3, 8)),
                "fine_a": jax.random.normal(ks[3], (3, 8)),
                "coarse_c": jax.random.normal(ks[4], (3, 4)),
                "fine_c": jax.random.normal(ks[5], (3, 4)),
            },
        }
        G, Hp, Wp = 2, 12, 16  # padded shapes shared by both groups
        rng = np.random.RandomState(0)

        def make_group(whs):
            Ks = np.zeros((G, 3, 3), np.float32)
            Ks[:, 0, 0] = Ks[:, 1, 1] = 15.0
            Ks[:, 0, 2] = np.asarray(whs)[:, 0] / 2
            Ks[:, 1, 2] = np.asarray(whs)[:, 1] / 2
            Ks[:, 2, 2] = 1
            return TTOGroup(
                Ks=jnp.asarray(Ks),
                base_poses=jnp.broadcast_to(jnp.eye(3, 4), (G, 3, 4)),
                rgbs=jnp.asarray(
                    rng.randint(0, 255, (G, Hp, Wp, 3)), jnp.uint8
                ),
                wh=jnp.asarray(whs, jnp.int32),
                near_far=jnp.tile(jnp.array([[0.5, 4.0]]), (G, 1)),
            )

        all_wh = np.asarray([[16, 12], [14, 10], [12, 12], [10, 8]])
        runner = TTORunner(
            frozen, cfg, 8,
            region_A=tto_region_size(all_wh, (0.0, 1.0), bucket=8),
            region_B=tto_region_size(all_wh, (0.5, 1.0), bucket=8),
        )
        silent = lambda *a, **k: None
        runner.run_group(make_group([[16, 12], [14, 10]]),
                         jax.random.PRNGKey(1), log=silent)
        runner.run_group(make_group([[12, 12], [10, 8]]),
                         jax.random.PRNGKey(2), log=silent)
        for fn in (runner.step_A, runner.step_B, runner.eval_A, runner.eval_B):
            assert fn._cache_size() == 1, fn


class TestShardedTTO:
    """Mesh-sharded TTO: per-image ray batches and eval chunk interiors
    split across the data axis; must match the single-device programs
    (pixel coords + render uniforms are drawn at global shape and
    sharded, so the step is numerically identical up to reduction
    order)."""

    def _setup(self, fused=False):
        nerf_cfg = NeRFConfig(
            D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=None,
        )
        cfg = TTOConfig(
            nerf=nerf_cfg,
            render=RenderConfig(
                N_samples=8, N_importance=4, perturb=1.0,
                precision="float32", fused_train=fused,
            ),
            batch_size=64,
            pose_epochs=1,
            appearance_epochs=1,
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        frozen = {
            "nerf_coarse": init_nerf(ks[0], nerf_cfg),
            "nerf_fine": init_nerf(ks[1], nerf_cfg),
            "embeddings": {
                "coarse_a": jax.random.normal(ks[2], (3, 8)),
                "fine_a": jax.random.normal(ks[3], (3, 8)),
                "coarse_c": jax.random.normal(ks[4], (3, 4)),
                "fine_c": jax.random.normal(ks[5], (3, 4)),
            },
        }
        G, H, W = 2, 12, 16
        Ks = np.zeros((G, 3, 3), np.float32)
        Ks[:, 0, 0] = Ks[:, 1, 1] = 15.0
        Ks[:, 0, 2] = W / 2
        Ks[:, 1, 2] = H / 2
        Ks[:, 2, 2] = 1
        rng = np.random.RandomState(0)
        group = TTOGroup(
            Ks=jnp.asarray(Ks),
            base_poses=jnp.broadcast_to(jnp.eye(3, 4), (G, 3, 4)),
            rgbs=jnp.asarray(rng.randint(0, 255, (G, H, W, 3)), jnp.uint8),
            wh=jnp.asarray([[W, H]] * G, jnp.int32),
            near_far=jnp.tile(jnp.array([[0.5, 4.0]]), (G, 1)),
        )
        return cfg, frozen, group

    def test_sharded_step_matches_single_device(self):
        import optax

        from upnerf.evaluate.tto import make_tto_step
        from upnerf.parallel import make_mesh

        cfg, frozen, group = self._setup()
        mesh = make_mesh()
        opt = optax.adam(1e-3)
        step_ref = make_tto_step(
            frozen, cfg, opt, optimize_pose=True, x_frac=(0.0, 1.0)
        )
        step_sh = make_tto_step(
            frozen, cfg, opt, optimize_pose=True, x_frac=(0.0, 1.0),
            mesh=mesh,
        )
        t0 = {"fine_a": jnp.zeros((2, 8)), "se3": jnp.zeros((2, 6))}
        key = jax.random.PRNGKey(3)
        t_a, os_a, loss_a = step_ref(t0, opt.init(t0), group, key)
        t_b, os_b, loss_b = step_sh(t0, opt.init(t0), group, key)
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-5)
        for x, y in zip(jax.tree.leaves(t_a), jax.tree.leaves(t_b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    def test_sharded_eval_matches_single_device(self):
        from upnerf.evaluate.tto import make_tto_eval
        from upnerf.parallel import make_mesh

        cfg, frozen, group = self._setup()
        mesh = make_mesh()
        eval_ref = make_tto_eval(frozen, cfg, x_frac=(0.5, 1.0), chunk=64)
        eval_sh = make_tto_eval(
            frozen, cfg, x_frac=(0.5, 1.0), chunk=64, mesh=mesh
        )
        t = {"fine_a": jnp.ones((2, 8)) * 0.1, "se3": jnp.zeros((2, 6))}
        p_a, g_a = eval_ref(t, group, 16, 8)
        p_b, g_b = eval_sh(t, group, 16, 8)
        np.testing.assert_allclose(np.asarray(p_b), np.asarray(p_a), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(g_b), np.asarray(g_a))

    def test_fused_kernels_shard_in_tto_step(self, monkeypatch):
        """TTO's phase-2 render through the fused Pallas path under the
        mesh (interpret mode) vs the single-device XLA path."""
        import optax

        from upnerf.evaluate.tto import make_tto_step
        from upnerf.ops import pallas_render_train as rt
        from upnerf.parallel import make_mesh

        monkeypatch.setattr(rt, "INTERPRET", True)
        cfg_x, frozen, group = self._setup(fused=False)
        cfg_f, _, _ = self._setup(fused=True)
        mesh = make_mesh()
        opt = optax.adam(1e-3)
        step_ref = make_tto_step(
            frozen, cfg_x, opt, optimize_pose=True, x_frac=(0.0, 1.0)
        )
        step_sh = make_tto_step(
            frozen, cfg_f, opt, optimize_pose=True, x_frac=(0.0, 1.0),
            mesh=mesh,
        )
        t0 = {"fine_a": jnp.zeros((2, 8)), "se3": jnp.zeros((2, 6))}
        key = jax.random.PRNGKey(3)
        _, _, loss_a = step_ref(t0, opt.init(t0), group, key)
        _, _, loss_b = step_sh(t0, opt.init(t0), group, key)
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=2e-4)
