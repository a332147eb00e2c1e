"""Interpreter-mode parity tests for the fused training render kernel
(upnerf.ops.pallas_render_train) against its XLA twin — forward outputs and
the full custom VJP (every input and weight gradient, every cotangent
path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.ops import pallas_render_train as rt


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(rt, "INTERPRET", True)


D, W, IN0, F, HH, HC, C = 2, 16, 9, 8, 8, 8, 4
SKIPS = (1,)
R, S = 16, 12


def make_static(use_cand, use_rgb, out_feat, save_chain=False):
    return rt.RTStatic(
        D=D, skips=SKIPS, use_cand=use_cand, use_rgb=use_rgb,
        out_feat=out_feat, precision="float32", ray_tile=8,
        save_chain=save_chain,
    )


def make_args(st, seed=0):
    rng = np.random.RandomState(seed)

    def arr(*shape, scale=0.5):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    x0 = arr(R * S, IN0)
    z = jnp.sort(jnp.asarray(rng.rand(R, S).astype(np.float32) * 4 + 0.1), -1)
    ray_cond = arr(R, HH) if st.use_rgb else None
    c_emb = arr(R, C) if st.use_cand else None
    trunk = []
    for i in range(D):
        fan = IN0 if i == 0 else (W + IN0 if i in SKIPS else W)
        trunk.append((arr(fan, W, scale=0.3), arr(W, scale=0.1)))
    trunk = tuple(trunk)
    heads = {
        "xyzf_w": arr(W, W, scale=0.3), "xyzf_b": arr(W, scale=0.1),
        "sigma_w": arr(W, 1, scale=0.3), "sigma_b": arr(1, scale=0.1),
    }
    if st.use_feat:
        heads["feat_w"] = arr(W, F, scale=0.3)
        heads["feat_b"] = arr(F, scale=0.1)
    if st.use_rgb:
        heads["rgb1_w"] = arr(F, HH, scale=0.3)
        heads["rgb2_w"] = arr(HH, 3, scale=0.3)
        heads["rgb2_b"] = arr(3, scale=0.1)
    if st.use_cand:
        heads.update(
            c1x_w=arr(W, HC, scale=0.3), c1c_w=arr(C, HC, scale=0.3),
            c1_b=arr(HC, scale=0.1), c2_w=arr(HC, HC, scale=0.3),
            c2_b=arr(HC, scale=0.1), csig_w=arr(HC, 1, scale=0.3),
            csig_b=arr(1, scale=0.1), cfeat_w=arr(HC, F, scale=0.3),
            cfeat_b=arr(F, scale=0.1),
        )
    return x0, z, ray_cond, c_emb, trunk, heads


COMBOS = [
    (True, True, True),    # phase 1 blended (flagship)
    (True, False, True),   # phase 0 feature/candidate
    (False, True, False),  # phase 2 rgb-only
    (False, True, True),   # phase<2 with candidate disabled (TTO-style)
]


@pytest.mark.parametrize("use_cand,use_rgb,out_feat", COMBOS)
class TestForwardParity:
    @pytest.mark.parametrize("save_chain", [False, True])
    def test_outputs_match_xla_twin(self, use_cand, use_rgb, out_feat,
                                    save_chain):
        st = make_static(use_cand, use_rgb, out_feat, save_chain)
        args = make_args(st)
        got = rt.fused_render_train(*args, st)
        want = rt.xla_render_train(*args, st)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=2e-5,
                atol=2e-5, err_msg=k,
            )


class TestMultiSubgroup:
    """The stage-major multi-subgroup path (G < ray_tile) — tiny default
    shapes give G == ray_tile, so force it with a 1 MB subgroup budget at
    S large enough to split the tile (upnerf.ops.pallas_render_train
    _group_rows)."""

    S_BIG = 64

    def _args(self, st, seed=21):
        rng = np.random.RandomState(seed)

        def arr(*shape, scale=0.4):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

        x0 = arr(R * self.S_BIG, IN0)
        z = jnp.sort(
            jnp.asarray(
                rng.rand(R, self.S_BIG).astype(np.float32) * 4 + 0.1
            ), -1,
        )
        _, _, ray_cond, c_emb, trunk, heads = make_args(st, seed=seed)
        return x0, z, ray_cond, c_emb, trunk, heads

    @pytest.mark.parametrize("save_chain", [False, True])
    def test_split_tile_matches_single_subgroup(self, save_chain):
        st = make_static(True, True, True, save_chain)
        st_multi = st._replace(group_budget_mb=1)
        from upnerf.ops.pallas_render_train import _group_rows
        G1 = _group_rows(st, self.S_BIG, IN0, W, F)
        Gn = _group_rows(st_multi, self.S_BIG, IN0, W, F)
        assert Gn < G1, (Gn, G1)  # the multi path is actually exercised

        args = self._args(st)
        rng = np.random.RandomState(9)
        ref_out = rt.xla_render_train(*args, st)
        cots = {
            k: jnp.asarray(rng.randn(*np.shape(v)).astype(np.float32))
            for k, v in ref_out.items()
        }

        def loss(fn, st_):
            def f(x0_, trunk_, heads_):
                out = fn(x0_, args[1], args[2], args[3], trunk_, heads_, st_)
                return sum((out[k] * cots[k]).sum() for k in out)
            return f

        g1 = jax.grad(loss(rt.fused_render_train, st), argnums=(0, 1, 2))(
            args[0], args[4], args[5]
        )
        gn = jax.grad(
            loss(rt.fused_render_train, st_multi), argnums=(0, 1, 2)
        )(args[0], args[4], args[5])
        for a, b in zip(jax.tree.leaves(gn), jax.tree.leaves(g1)):
            scale = max(1e-3, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-5, atol=5e-6,
            )


@pytest.mark.parametrize("save_chain", [False, True])
@pytest.mark.parametrize("use_cand,use_rgb,out_feat", COMBOS)
class TestVJPParity:
    def test_grads_match_xla_twin(self, use_cand, use_rgb, out_feat,
                                  save_chain):
        st = make_static(use_cand, use_rgb, out_feat, save_chain)
        x0, z, ray_cond, c_emb, trunk, heads = make_args(st)
        rng = np.random.RandomState(7)
        ref = rt.xla_render_train(x0, z, ray_cond, c_emb, trunk, heads, st)
        cots = {
            k: jnp.asarray(rng.randn(*np.shape(v)).astype(np.float32))
            for k, v in ref.items()
        }

        def loss(fn):
            def f(x0_, cond_, cemb_, trunk_, heads_):
                out = fn(x0_, z, cond_, cemb_, trunk_, heads_, st)
                return sum((out[k] * cots[k]).sum() for k in out)
            return f

        diff_args = (x0, ray_cond, c_emb, trunk, heads)
        g_fused = jax.grad(loss(rt.fused_render_train), argnums=(0, 1, 2, 3, 4))(
            *diff_args
        )
        g_xla = jax.grad(loss(rt.xla_render_train), argnums=(0, 1, 2, 3, 4))(
            *diff_args
        )
        flat_f, _ = jax.tree.flatten(g_fused)
        flat_x, tree = jax.tree.flatten(g_xla)
        assert len(flat_f) == len(flat_x)
        for a, b in zip(flat_f, flat_x):
            scale = max(1e-3, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-4, atol=5e-5,
            )

    def test_rays_frontend_matches_twin(self, use_cand, use_rgb, out_feat,
                                        save_chain):
        """xyz + annealed PE built IN-KERNEL (st.xyz_L > 0): forward and
        the d_rays_o / d_rays_d pose-gradient path vs the XLA twin."""
        L = 3
        st = make_static(use_cand, use_rgb, out_feat, save_chain)._replace(xyz_L=L)
        # trunk input width must be 3 + 6L
        rng = np.random.RandomState(11)

        def arr(*shape, scale=0.5):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

        in0 = 3 + 6 * L
        _, z, ray_cond, c_emb, _, heads = make_args(st, seed=11)
        trunk = []
        for i in range(D):
            fan = in0 if i == 0 else (W + in0 if i in SKIPS else W)
            trunk.append((arr(fan, W, scale=0.3), arr(W, scale=0.1)))
        trunk = tuple(trunk)
        rays_o = arr(R, 3, scale=0.2)
        rays_d = arr(R, 3)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        pe_w = jnp.asarray(rng.rand(L).astype(np.float32))
        args = (rays_o, rays_d, z, pe_w, ray_cond, c_emb, trunk, heads)

        got = rt.fused_render_train_rays(*args, st)
        want = rt.xla_render_train_rays(*args, st)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(want[k]), rtol=2e-5,
                atol=2e-5, err_msg=k,
            )

        cots = {
            k: jnp.asarray(
                np.random.RandomState(5).randn(*np.shape(v)).astype(np.float32)
            )
            for k, v in want.items()
        }

        def loss(fn):
            def f(o_, d_, cond_, cemb_, trunk_, heads_):
                out = fn(o_, d_, z, pe_w, cond_, cemb_, trunk_, heads_, st)
                return sum((out[k] * cots[k]).sum() for k in out)
            return f

        dargs = (rays_o, rays_d, ray_cond, c_emb, trunk, heads)
        gf = jax.grad(loss(rt.fused_render_train_rays),
                      argnums=tuple(range(6)))(*dargs)
        gx = jax.grad(loss(rt.xla_render_train_rays),
                      argnums=tuple(range(6)))(*dargs)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
            scale = max(1e-3, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-4, atol=5e-5,
            )

    def test_live_cotangents_only(self, use_cand, use_rgb, out_feat,
                                  save_chain):
        """The training loss only touches feat/rgb/depth — exercise exactly
        that cotangent structure (zeros elsewhere arrive materialized)."""
        st = make_static(use_cand, use_rgb, out_feat, save_chain)
        x0, z, ray_cond, c_emb, trunk, heads = make_args(st, seed=3)
        live = [k for k in ("feat_map", "rgb_map", "s_depth") if k in st.out_keys]

        def loss(fn):
            def f(x0_, trunk_):
                out = fn(x0_, z, ray_cond, c_emb, trunk_, heads, st)
                return sum(out[k].sum() for k in live)
            return f

        gf = jax.grad(loss(rt.fused_render_train), argnums=(0, 1))(x0, trunk)
        gx = jax.grad(loss(rt.xla_render_train), argnums=(0, 1))(x0, trunk)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
            scale = max(1e-3, float(jnp.abs(b).max()))
            np.testing.assert_allclose(
                np.asarray(a) / scale, np.asarray(b) / scale,
                rtol=5e-4, atol=5e-5,
            )


@pytest.mark.parametrize("save_chain", [False, True])
@pytest.mark.parametrize("use_cand,use_rgb,out_feat", COMBOS)
class TestFrozenModelBackward:
    """param_grads=False (the TTO frozen-model mode, cli/tto.py): the
    backward skips every dW computation; data-path cotangents must match
    the full kernel's exactly and the weight cotangents come back zero."""

    def test_data_grads_match_full_kernel(self, use_cand, use_rgb,
                                          out_feat, save_chain):
        st = make_static(use_cand, use_rgb, out_feat, save_chain)
        st_frozen = st._replace(param_grads=False)
        x0, z, ray_cond, c_emb, trunk, heads = make_args(st, seed=17)
        rng = np.random.RandomState(23)
        ref = rt.xla_render_train(x0, z, ray_cond, c_emb, trunk, heads, st)
        cots = {
            k: jnp.asarray(rng.randn(*np.shape(v)).astype(np.float32))
            for k, v in ref.items()
        }

        def loss(st_):
            def f(x0_, cond_, cemb_, trunk_, heads_):
                out = rt.fused_render_train(
                    x0_, z, cond_, cemb_, trunk_, heads_, st_
                )
                return sum((out[k] * cots[k]).sum() for k in out)
            return f

        dargs = (x0, ray_cond, c_emb, trunk, heads)
        g_full = jax.grad(loss(st), argnums=(0, 1, 2))(*dargs)
        g_frozen = jax.grad(loss(st_frozen), argnums=(0, 1, 2))(*dargs)
        for a, b in zip(jax.tree.leaves(g_frozen), jax.tree.leaves(g_full)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )

        gw = jax.grad(loss(st_frozen), argnums=(3, 4))(*dargs)
        for leaf in jax.tree.leaves(gw):
            assert not np.any(np.asarray(leaf)), "weight cotangent nonzero"

    def test_rays_frontend_pose_grads(self, use_cand, use_rgb, out_feat,
                                      save_chain):
        """The pose-gradient path (d_rays_o / d_rays_d) under the frozen
        backward — the gradients TTO phase A actually consumes."""
        L = 3
        st = make_static(use_cand, use_rgb, out_feat, save_chain)._replace(
            xyz_L=L
        )
        rng = np.random.RandomState(29)

        def arr(*shape, scale=0.5):
            return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

        in0 = 3 + 6 * L
        _, z, ray_cond, c_emb, _, heads = make_args(st, seed=29)
        trunk = []
        for i in range(D):
            fan = in0 if i == 0 else (W + in0 if i in SKIPS else W)
            trunk.append((arr(fan, W, scale=0.3), arr(W, scale=0.1)))
        trunk = tuple(trunk)
        rays_o = arr(R, 3, scale=0.2)
        rays_d = arr(R, 3)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        pe_w = jnp.asarray(rng.rand(L).astype(np.float32))
        ref = rt.xla_render_train_rays(
            rays_o, rays_d, z, pe_w, ray_cond, c_emb, trunk, heads, st
        )
        cots = {
            k: jnp.asarray(rng.randn(*np.shape(v)).astype(np.float32))
            for k, v in ref.items()
        }

        def loss(st_):
            def f(o_, d_, cond_):
                out = rt.fused_render_train_rays(
                    o_, d_, z, pe_w, cond_, c_emb, trunk, heads, st_
                )
                return sum((out[k] * cots[k]).sum() for k in out)
            return f

        g_full = jax.grad(loss(st), argnums=(0, 1, 2))(
            rays_o, rays_d, ray_cond
        )
        g_frozen = jax.grad(loss(st._replace(param_grads=False)),
                            argnums=(0, 1, 2))(rays_o, rays_d, ray_cond)
        for a, b in zip(jax.tree.leaves(g_frozen), jax.tree.leaves(g_full)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )
