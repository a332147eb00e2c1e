import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.models import NeRFConfig, init_nerf
from upnerf.render import RenderConfig, render_rays, sample_pdf, stratified_z_vals
from upnerf.render import volume

CFG = NeRFConfig(D=2, W=16, skips=(1,), feat_dim=8, xyz_L=2, dir_L=1,
                 appearance_dim=4, candidate_dim=4, c2f=(0.1, 0.5))
RCFG = RenderConfig(N_samples=12, N_importance=6, perturb=1.0,
                    encode_feat=True, precision="float32")


def make_params(n_images=3):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    return {
        "nerf_coarse": init_nerf(ks[0], CFG),
        "nerf_fine": init_nerf(ks[1], CFG),
        "embeddings": {
            "coarse_a": jax.random.normal(ks[2], (n_images, CFG.appearance_dim)),
            "fine_a": jax.random.normal(ks[3], (n_images, CFG.appearance_dim)),
            "coarse_c": jax.random.normal(ks[4], (n_images, CFG.candidate_dim)),
            "fine_c": jax.random.normal(ks[5], (n_images, CFG.candidate_dim)),
        },
    }


def make_rays(R=5):
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    o = jax.random.normal(ks[0], (R, 3)) * 0.1
    d = jax.random.normal(ks[1], (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0)], -1
    )
    return rays, jnp.array([0, 1, 2, 0, 1])


class TestSampling:
    def test_stratified_det_grid(self):
        near = jnp.full((4, 1), 1.0)
        far = jnp.full((4, 1), 3.0)
        z = stratified_z_vals(None, near, far, 5, perturb=0.0)
        np.testing.assert_allclose(
            np.asarray(z[0]), np.linspace(1, 3, 5), atol=1e-6
        )

    def test_stratified_perturb_within_bounds(self):
        near = jnp.full((64, 1), 1.0)
        far = jnp.full((64, 1), 3.0)
        z = stratified_z_vals(jax.random.PRNGKey(0), near, far, 16, perturb=1.0)
        zn = np.asarray(z)
        assert (zn >= 1.0 - 1e-6).all() and (zn <= 3.0 + 1e-6).all()
        assert (np.diff(zn, axis=-1) > -1e-6).all()  # still sorted

    def test_disparity_sampling(self):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 4.0)
        z = stratified_z_vals(None, near, far, 3, use_disp=True, perturb=0.0)
        np.testing.assert_allclose(
            np.asarray(z[0]), [1.0, 1.6, 4.0], atol=1e-5
        )  # linear in 1/z: 1, 1/0.625, 1/0.25

    def test_sample_pdf_concentrates(self):
        # All weight in one bin -> all samples inside that bin.
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (16, 9))
        w = jnp.zeros((16, 8)).at[:, 3].set(1.0)
        s = sample_pdf(jax.random.PRNGKey(0), bins, w, 32)
        sn = np.asarray(s)
        frac_inside = ((sn >= 3 / 8 - 1e-3) & (sn <= 4 / 8 + 1e-3)).mean()
        assert frac_inside > 0.95  # +eps smoothing leaks a tiny fraction

    def test_sample_pdf_det_uniform(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        w = jnp.ones((4, 8))
        s = sample_pdf(None, bins, w, 16, det=True)
        np.testing.assert_allclose(
            np.asarray(s[0]), np.linspace(0, 1, 16), atol=1e-4
        )


class TestVolume:
    def test_weights_formula(self):
        alphas = jnp.array([[0.5, 0.5, 1.0]])
        w = volume.composite_weights(alphas)
        np.testing.assert_allclose(np.asarray(w[0]), [0.5, 0.25, 0.25], atol=1e-6)

    def test_opaque_sample_terminates(self):
        alphas = jnp.array([[0.0, 1.0, 0.7]])
        w = volume.composite_weights(alphas)
        np.testing.assert_allclose(np.asarray(w[0]), [0.0, 1.0, 0.0], atol=1e-6)

    def test_weights_sum_le_one(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (32, 16))
        w = volume.composite_weights(a)
        assert (np.asarray(w.sum(-1)) <= 1.0 + 1e-5).all()


class TestRenderRays:
    @pytest.mark.parametrize("phase,sched", [(0, 0.0), (1, 0.4), (2, 1.0)])
    def test_output_keys_and_shapes(self, phase, sched):
        params = make_params()
        rays, idx = make_rays()
        out = render_rays(
            params, RCFG, CFG, rays, idx,
            key=jax.random.PRNGKey(2), phase=phase,
            sched_mult=jnp.array(sched), progress=jnp.array(0.3),
        )
        R, S, F = 5, RCFG.N_samples, RCFG.N_samples + RCFG.N_importance
        for typ, ns in [("coarse", S), ("fine", F)]:
            assert out[f"s_depth_{typ}"].shape == (R,)
            if phase < 2:
                assert out[f"c_weights_{typ}"].shape == (R, ns)
                assert out[f"feat_{typ}"].shape == (R, CFG.feat_dim)
                assert out[f"t_weight_{typ}"].shape == (R,)
                assert out[f"c_depth_{typ}"].shape == (R,)
            if phase > 0:
                assert out[f"s_rgb_{typ}"].shape == (R, 3)
                assert out[f"s_weights_{typ}"].shape == (R, ns)

    def test_candidate_disabled(self):
        params = make_params()
        rays, idx = make_rays()
        out = render_rays(
            params, RCFG, CFG, rays, idx,
            key=None, phase=2,
            sched_mult=jnp.array(1.0), progress=jnp.array(1.0),
            encode_candidate=False, det=True,
        )
        assert not any(k.startswith("c_") for k in out)

    def test_depth_in_bounds(self):
        params = make_params()
        rays, idx = make_rays()
        out = render_rays(
            params, RCFG, CFG, rays, idx,
            key=None, phase=0,
            sched_mult=jnp.array(0.0), progress=jnp.array(0.0), det=True,
        )
        d = np.asarray(out["s_depth_fine"])
        assert (d >= 0).all() and (d <= 4.0 + 1e-4).all()

    def test_pose_gradient_flows_through_xyz_not_dir(self):
        # Directions are detached as MLP *inputs* but origins still carry
        # gradient (models/rendering.py:104-106): perturbing rays_o must
        # change the loss gradient; the dir-PE path must not leak gradient.
        params = make_params()
        rays, idx = make_rays()

        def loss_of_origin(do):
            r = rays.at[:, 0:3].add(do)
            out = render_rays(
                params, RCFG, CFG, r, idx,
                key=None, phase=0,
                sched_mult=jnp.array(0.0), progress=jnp.array(0.5), det=True,
            )
            return (out["feat_fine"] ** 2).sum()

        g = jax.grad(loss_of_origin)(jnp.zeros((5, 3)))
        assert np.abs(np.asarray(g)).max() > 0
