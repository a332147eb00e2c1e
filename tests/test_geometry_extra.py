import jax
import jax.numpy as jnp
import numpy as np

from upnerf.geometry import quaternion, rays, se3


class TestQuaternion:
    def test_q_R_roundtrip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (6, 3)) * 0.6
        R = se3.so3_to_SO3(w)
        q = quaternion.R_to_q(R)
        R2 = quaternion.q_to_R(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)

    def test_product_matches_rotation_compose(self):
        w1 = jnp.array([[0.2, -0.1, 0.3]])
        w2 = jnp.array([[-0.3, 0.2, 0.1]])
        R1, R2 = se3.so3_to_SO3(w1), se3.so3_to_SO3(w2)
        q1, q2 = quaternion.R_to_q(R1), quaternion.R_to_q(R2)
        q12 = quaternion.product(q1, q2)
        np.testing.assert_allclose(
            np.asarray(quaternion.q_to_R(q12)), np.asarray(R1 @ R2), atol=1e-4
        )

    def test_invert(self):
        q = quaternion.R_to_q(se3.so3_to_SO3(jnp.array([[0.4, 0.1, -0.2]])))
        qi = quaternion.invert(q)
        ident = quaternion.product(q, qi)
        np.testing.assert_allclose(np.asarray(ident[0]), [1, 0, 0, 0], atol=1e-5)


class TestNDC:
    def test_rays_land_in_cube(self):
        H, W, focal = 40, 60, 50.0
        K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
        d = rays.get_ray_directions(H, W, K).reshape(-1, 3)
        c2w = jnp.eye(3, 4)
        rays_o, rays_d = rays.get_rays(d, c2w)
        o_ndc, d_ndc = rays.get_ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
        on = np.asarray(o_ndc)
        assert np.isfinite(on).all()
        # origins shifted to the near plane: z component == -1
        np.testing.assert_allclose(on[:, 2], -1.0, atol=1e-4)


class TestNovelViewPoses:
    def test_orbit_shape_and_validity(self):
        anchor = se3.se3_to_SE3(jnp.array([0.1, 0.2, -0.1, 0.5, 0.0, 1.0]))
        poses = se3.get_novel_view_poses(anchor, N=12, scale=1.0)
        assert poses.shape == (12, 3, 4)
        R = np.asarray(poses[..., :3])
        np.testing.assert_allclose(
            R @ np.swapaxes(R, -2, -1),
            np.broadcast_to(np.eye(3), R.shape),
            atol=1e-5,
        )

    def test_angle_to_rotation_matrix_axes(self):
        a = jnp.array(0.3)
        for axis in "XYZ":
            R = se3.angle_to_rotation_matrix(a, axis)
            np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)
        Rz = se3.angle_to_rotation_matrix(a, "Z")
        v = np.asarray(Rz) @ np.array([1.0, 0, 0])
        np.testing.assert_allclose(v, [np.cos(0.3), np.sin(0.3), 0], atol=1e-5)
