"""Fused Pallas trunk kernel vs the XLA reference (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.ops import pallas_mlp


@pytest.fixture(autouse=True)
def interpret_mode():
    from upnerf.ops import pallas_heads, pallas_render

    for mod in (pallas_mlp, pallas_heads, pallas_render):
        mod.INTERPRET = True
    yield
    for mod in (pallas_mlp, pallas_heads, pallas_render):
        mod.INTERPRET = False


def make_params(D=4, W=32, in0=24, skips=(2,), seed=0):
    ks = iter(jax.random.split(jax.random.PRNGKey(seed), 2 * D + 2))
    return tuple(
        (
            jax.random.normal(
                next(ks), (pallas_mlp._layer_in_dim(i, in0, W, skips), W)
            )
            * 0.1,
            jax.random.normal(next(ks), (W,)) * 0.1,
        )
        for i in range(D)
    )


class TestFusedTrunk:
    def test_forward_matches_xla(self):
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 24))
        ref = pallas_mlp.reference_trunk(x, params, skips)
        out = pallas_mlp.fused_trunk(x, params, skips, 32, "float32")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match_xla(self):
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 24))

        gk = jax.grad(
            lambda x, p: (pallas_mlp.fused_trunk(x, p, skips, 32, "float32") ** 2).sum(),
            argnums=(0, 1),
        )(x, params)
        gr = jax.grad(
            lambda x, p: (pallas_mlp.reference_trunk(x, p, skips) ** 2).sum(),
            argnums=(0, 1),
        )(x, params)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_no_skip_config(self):
        skips = ()
        params = make_params(D=3, skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 24))
        ref = pallas_mlp.reference_trunk(x, params, skips)
        out = pallas_mlp.fused_trunk(x, params, skips, 32, "float32")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_multi_tile_grad_accumulation(self):
        # dW must accumulate across sequential grid steps
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(3), (128, 24))
        gk = jax.grad(
            lambda p: (pallas_mlp.fused_trunk(x, p, skips, 32, "float32")).sum()
        )(params)
        gr = jax.grad(
            lambda p: (pallas_mlp.reference_trunk(x, p, skips)).sum()
        )(params)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )


class TestFusedNeRFIntegration:
    def test_apply_nerf_fused_matches_xla(self):
        from upnerf.models import NeRFConfig, apply_nerf, init_nerf

        cfg = NeRFConfig(
            D=4, W=32, skips=(2,), feat_dim=16, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5),
        )
        params = init_nerf(jax.random.PRNGKey(0), cfg)
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        inputs = {
            "input_xyz": jax.random.normal(ks[0], (6, 5, 3)),
            "input_dir": jax.random.normal(ks[1], (6, 5, 3)),
            "input_a": jax.random.normal(ks[2], (6, 5, 8)),
            "input_c": jax.random.normal(ks[3], (6, 5, 4)),
        }
        common = dict(
            phase=1, sched_mult=jnp.asarray(0.5), progress=jnp.asarray(0.3),
            precision="float32",
        )
        ref = apply_nerf(params, cfg, inputs, **common)
        out = apply_nerf(
            params, cfg._replace(fused_trunk=True), inputs, **common
        )
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=1e-5, err_msg=k
            )


class TestFusedStaticRender:
    """Mega-kernel (trunk+heads+compositing) vs the XLA phase-2 path."""

    def _setup(self):
        from upnerf.models import NeRFConfig, init_nerf
        from upnerf.ops import pallas_render

        pallas_render.INTERPRET = True
        cfg = NeRFConfig(
            D=4, W=32, skips=(2,), feat_dim=16, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5),
        )
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        params = {
            "nerf_coarse": init_nerf(ks[0], cfg),
            "nerf_fine": init_nerf(ks[1], cfg),
            "embeddings": {
                "coarse_a": jax.random.normal(ks[2], (3, 8)),
                "fine_a": jax.random.normal(ks[3], (3, 8)),
                "coarse_c": jax.random.normal(ks[4], (3, 4)),
                "fine_c": jax.random.normal(ks[5], (3, 4)),
            },
        }
        o = jax.random.normal(ks[6], (16, 3)) * 0.1
        d = jax.random.normal(ks[7], (16, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.concatenate(
            [o, d, jnp.full((16, 1), 0.5), jnp.full((16, 1), 4.0)], -1
        )
        return cfg, params, rays, jnp.arange(16) % 3

    def test_phase2_render_parity_and_grads(self):
        from upnerf.render import RenderConfig, render_rays

        cfg, params, rays, idx = self._setup()
        common = dict(
            key=None, phase=2, sched_mult=jnp.asarray(1.0),
            progress=jnp.asarray(1.0), det=True,
        )
        rc_x = RenderConfig(
            N_samples=8, N_importance=8, precision="float32", fused_render=False
        )
        out_x = render_rays(params, rc_x, cfg, rays, idx, **common)
        out_f = render_rays(
            params, rc_x._replace(fused_render=True), cfg, rays, idx, **common
        )
        assert set(out_x) == set(out_f)
        for k in out_x:
            np.testing.assert_allclose(
                np.asarray(out_f[k]), np.asarray(out_x[k]), atol=1e-5, err_msg=k
            )

        def loss(p, rc):
            o = render_rays(p, rc, cfg, rays, idx, **common)
            return (o["s_rgb_fine"] ** 2).sum() + o["s_depth_coarse"].sum() * 0.1

        gx = jax.grad(loss)(params, rc_x)
        gf = jax.grad(loss)(params, rc_x._replace(fused_render=True))
        for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestFusedTrunkHeads:
    """Trunk+heads kernel (pallas_heads) vs apply_nerf's XLA path."""

    def _setup(self):
        from upnerf.models import NeRFConfig, init_nerf
        from upnerf.ops import pallas_heads

        pallas_heads.INTERPRET = True
        cfg = NeRFConfig(
            D=4, W=32, skips=(2,), feat_dim=16, xyz_L=4, dir_L=2,
            appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5),
        )
        params = init_nerf(jax.random.PRNGKey(0), cfg)
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        inputs = {
            "input_xyz": jax.random.normal(ks[0], (4, 4, 3)),
            "input_dir": jax.random.normal(ks[1], (4, 3)),
            "input_a": jax.random.normal(ks[2], (4, 8)),
            "input_c": jax.random.normal(ks[3], (4, 4)),
        }
        return cfg, params, inputs

    @pytest.mark.parametrize("phase,sched", [(0, 0.0), (1, 0.5), (2, 1.0)])
    def test_apply_nerf_parity(self, phase, sched):
        from upnerf.models import apply_nerf

        cfg, params, inputs = self._setup()
        common = dict(
            phase=phase, sched_mult=jnp.asarray(sched),
            progress=jnp.asarray(0.3), precision="float32",
        )
        ref = apply_nerf(params, cfg, inputs, **common)
        out = apply_nerf(params, cfg._replace(fused_trunk=True), inputs, **common)
        assert set(ref) == set(out)
        for k in ref:
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=1e-5, err_msg=k
            )

    def test_gradient_parity(self):
        from upnerf.models import apply_nerf

        cfg, params, inputs = self._setup()

        def loss(p, c):
            o = apply_nerf(
                p, c, inputs, phase=1, sched_mult=jnp.asarray(0.5),
                progress=jnp.asarray(0.3), precision="float32",
            )
            return sum((v**2).sum() for v in o.values())

        g1 = jax.grad(loss)(params, cfg)
        g2 = jax.grad(loss)(params, cfg._replace(fused_trunk=True))
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
