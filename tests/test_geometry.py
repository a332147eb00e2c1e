import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.geometry import procrustes, rays, se3


def rand_se3(key, n, scale=0.5):
    return jax.random.normal(key, (n, 6)) * scale


class TestLie:
    def test_se3_exp_log_roundtrip(self):
        wu = rand_se3(jax.random.PRNGKey(0), 32)
        Rt = se3.se3_to_SE3(wu)
        wu2 = se3.SE3_to_se3(Rt)
        # fp32 log-map conditioning limits the roundtrip to ~1e-3 for large
        # rotations (same as the torch reference); the exp of the recovered
        # se3 must reproduce the pose tightly.
        np.testing.assert_allclose(np.asarray(wu2), np.asarray(wu), atol=5e-3)
        Rt2 = se3.se3_to_SE3(wu2)
        np.testing.assert_allclose(np.asarray(Rt2), np.asarray(Rt), atol=2e-3)

    def test_exp_at_zero_is_identity(self):
        Rt = se3.se3_to_SE3(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(Rt), np.eye(3, 4), atol=1e-6)

    def test_grad_safe_at_zero(self):
        # The identity pose init (models/nerf_system.py:406-407) requires
        # finite gradients of the exp map at exactly zero.
        g = jax.grad(lambda w: se3.se3_to_SE3(w).sum())(jnp.zeros(6))
        assert np.isfinite(np.asarray(g)).all()

    def test_SO3_orthonormal(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        R = se3.so3_to_SO3(w)
        I = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.swapaxes(R, -2, -1)), np.asarray(I), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_taylor_matches_closed_form(self):
        x = jnp.linspace(0.01, 1.5, 50)
        # closed forms evaluated in f64 (they cancel catastrophically in f32
        # at small x — which is why the reference uses the series at all)
        x64 = np.asarray(x, np.float64)
        np.testing.assert_allclose(
            np.asarray(se3.taylor_A(x)), np.sin(x64) / x64, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(se3.taylor_B(x)), (1 - np.cos(x64)) / x64**2, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(se3.taylor_C(x)), (x64 - np.sin(x64)) / x64**3, atol=1e-6
        )


class TestPose:
    def test_compose_invert(self):
        key = jax.random.PRNGKey(2)
        a = se3.se3_to_SE3(rand_se3(key, 8))
        b = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(3), 8))
        ab = se3.compose([a, b])
        # compose then apply == apply b(a(x))
        x = jax.random.normal(jax.random.PRNGKey(4), (8, 5, 3))
        y1 = se3.world2cam(se3.world2cam(x, a), b)
        y2 = se3.world2cam(x, ab)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
        # invert round trip
        inv = se3.invert(a)
        ident = se3.compose([a, inv])
        np.testing.assert_allclose(
            np.asarray(ident), np.broadcast_to(np.eye(3, 4), (8, 3, 4)), atol=1e-5
        )

    def test_cam2world_world2cam_roundtrip(self):
        pose = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(5), 4))
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 7, 3))
        np.testing.assert_allclose(
            np.asarray(se3.world2cam(se3.cam2world(x, pose), pose)),
            np.asarray(x),
            atol=1e-5,
        )


class TestRays:
    def test_pinhole_identity(self):
        H, W = 8, 12
        K = np.array([[100.0, 0, 6.0], [0, 100.0, 4.0], [0, 0, 1]], np.float32)
        d = rays.get_ray_directions(H, W, K)
        assert d.shape == (H, W, 3)
        # principal point pixel maps to the optical axis (no +0.5 centering)
        np.testing.assert_allclose(np.asarray(d[4, 6]), [0, 0, -1], atol=1e-6)
        # reproject: x = fx * dx / (-dz) + cx must equal the pixel column
        i = np.arange(W, dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(d[0, :, 0]) * 100.0 + 6.0, i, atol=1e-4
        )

    def test_pixel_directions_matches_grid(self):
        H, W = 6, 9
        K = np.array([[50.0, 0, 4.5], [0, 55.0, 3.0], [0, 0, 1]], np.float32)
        grid = rays.get_ray_directions(H, W, K).reshape(-1, 3)
        jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        d = rays.pixel_directions(
            jnp.asarray(ii.ravel()), jnp.asarray(jj.ravel()), jnp.asarray(K)
        )
        np.testing.assert_allclose(np.asarray(d), np.asarray(grid), atol=1e-6)

    def test_get_rays_single_and_batched_pose_agree(self):
        K = np.array([[50.0, 0, 4.0], [0, 50.0, 3.0], [0, 0, 1]], np.float32)
        d = rays.get_ray_directions(6, 8, K).reshape(-1, 3)
        pose = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(7), 1))[0]
        o1, d1 = rays.get_rays(d, pose)
        poses = jnp.broadcast_to(pose, (d.shape[0], 3, 4))
        o2, d2 = rays.get_rays(d, poses)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(d1), axis=-1), 1.0, atol=1e-6
        )


class TestProcrustes:
    def test_recovers_known_sim3(self):
        key = jax.random.PRNGKey(8)
        X1 = jax.random.normal(key, (40, 3))
        R = se3.so3_to_SO3(jnp.array([0.3, -0.2, 0.5]))
        s, t = 2.5, jnp.array([1.0, -2.0, 0.5])
        X0 = s * X1 @ R.T + t
        sim3 = procrustes.procrustes_analysis(X0, X1)
        X1to0 = (X1 - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0
        np.testing.assert_allclose(np.asarray(X1to0), np.asarray(X0), atol=1e-4)

    def test_pose_metric_zero_for_identical(self):
        poses = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(9), 12))
        err, aligned, gt = procrustes.pose_metric(poses, poses)
        assert err is not None
        assert np.asarray(err["R"]).max() < 1e-3
        assert np.asarray(err["t"]).max() < 1e-3

    def test_pose_metric_detects_rotation(self):
        gt = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(10), 12))
        # rotate every camera by the same world-frame sim3 -> alignable, ~0 err
        g = se3.se3_to_SE3(jnp.array([0.1, 0.2, -0.1, 0.3, 0.0, 0.1]))
        gb = jnp.broadcast_to(g, (12, 3, 4))
        moved = se3.compose([gt, gb])
        err, _, _ = procrustes.pose_metric(moved, gt)
        assert err is not None
        # global transforms are absorbed by the sim3 alignment
        assert np.asarray(err["R"]).mean() < 0.02

    def test_relative_pose_error_gauge_invariant(self):
        # A global SE(3) gauge change + uniform scale must read as zero error.
        gt = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(11), 10))
        g = se3.se3_to_SE3(jnp.array([0.4, -0.2, 0.3, 1.0, -0.5, 2.0]))
        gb = jnp.broadcast_to(g, (10, 3, 4))
        moved = se3.compose([gt, gb])  # world-frame gauge transform
        scaled = moved.at[..., :3, 3].multiply(3.0)  # global scale on centers
        rel = procrustes.relative_pose_error(scaled, gt)
        assert rel["R"].max() < 2e-3
        assert rel["t"].max() < 5e-3

    def test_relative_pose_error_detects_perturbation(self):
        gt = se3.se3_to_SE3(rand_se3(jax.random.PRNGKey(12), 10))
        # rotate ONE camera by 0.3 rad: 9/45 pairs pick up ~0.3 rad error
        bump = se3.se3_to_SE3(jnp.array([0.0, 0.0, 0.3, 0.0, 0.0, 0.0]))
        moved = gt.at[0].set(se3.compose([gt[0:1], bump[None]])[0])
        rel = procrustes.relative_pose_error(moved, gt)
        assert rel["R"].max() > 0.29
        assert np.sort(rel["R"])[-9] > 0.29  # all 9 pairs involving cam 0
        assert np.sort(rel["R"])[:36].max() < 2e-3  # the rest unaffected

    def test_relative_pose_error_stable_where_procrustes_flips(self):
        # Near-coplanar ring of camera centers: the Procrustes branch is
        # reflection-bistable there (the regression that motivated this
        # metric); the pairwise metric must stay ~0 for a pure gauge change.
        n = 8
        ang = np.linspace(0, 2 * np.pi * 0.2, n)
        centers = np.stack(
            [3 * np.sin(ang), 0.6 * np.ones(n), 3 * np.cos(ang)], -1
        )
        poses = []
        for c in centers:
            f = -c / np.linalg.norm(c)
            r = np.cross(f, [0.0, 1.0, 0.0]); r /= np.linalg.norm(r)
            u = np.cross(r, f)
            poses.append(np.concatenate([np.stack([r, u, -f], 1), c[:, None]], 1))
        gt = jnp.asarray(np.stack(poses), jnp.float32)
        g = se3.se3_to_SE3(jnp.array([0.05, -0.03, 0.02, 0.1, 0.0, -0.1]))
        moved = se3.compose([gt, jnp.broadcast_to(g, (n, 3, 4))])
        rel = procrustes.relative_pose_error(moved, gt)
        assert rel["R"].max() < 2e-3
        assert rel["t"].max() < 5e-3

    def test_rotation_distance(self):
        R1 = se3.so3_to_SO3(jnp.array([0.0, 0.0, 0.0]))
        R2 = se3.so3_to_SO3(jnp.array([0.0, 0.0, 0.5]))
        ang = procrustes.rotation_distance(R1, R2)
        np.testing.assert_allclose(float(ang), 0.5, atol=1e-5)
