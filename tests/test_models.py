import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.models import (
    NeRFConfig,
    TransientConfig,
    apply_nerf,
    apply_transient,
    init_nerf,
    init_transient,
    positional_encoding,
)
from upnerf.models.nerf import pe_weight

CFG = NeRFConfig(D=4, W=32, skips=(2,), feat_dim=16, xyz_L=4, dir_L=2,
                 appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5))


def make_inputs(key, B=6, cfg=CFG):
    ks = jax.random.split(key, 4)
    return {
        "input_xyz": jax.random.normal(ks[0], (B, 3)),
        "input_dir": jax.random.normal(ks[1], (B, 3)),
        "input_a": jax.random.normal(ks[2], (B, cfg.appearance_dim)),
        "input_c": jax.random.normal(ks[3], (B, cfg.candidate_dim)),
    }


class TestPositionalEncoding:
    def test_layout_matches_torch_reference(self):
        # Per coordinate: [sin(f0 x)..sin(fL-1 x), cos(f0 x)..cos(fL-1 x)],
        # raw input prepended (models/nerf.py:126-147).
        x = jnp.array([[0.3, -0.7, 1.1]])
        L = 3
        out = positional_encoding(x, L)
        assert out.shape == (1, 3 + 3 * 2 * L)
        freqs = 2.0 ** np.arange(L) * np.pi
        expect = [0.3, -0.7, 1.1]
        for c in [0.3, -0.7, 1.1]:
            expect += list(np.sin(c * freqs)) + list(np.cos(c * freqs))
        np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-5)

    def test_anneal_weights(self):
        # progress below start -> all bands off except ramping band 0;
        # above end -> all on (models/nerf.py:137-145).
        w0 = pe_weight(jnp.array(0.0), 4, (0.1, 0.5))
        np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-6)
        w1 = pe_weight(jnp.array(0.6), 4, (0.1, 0.5))
        np.testing.assert_allclose(np.asarray(w1), 1.0, atol=1e-6)
        wm = pe_weight(jnp.array(0.3), 4, (0.1, 0.5))  # alpha = 2.0
        np.testing.assert_allclose(np.asarray(wm), [1.0, 1.0, 0.0, 0.0], atol=1e-6)

    def test_weight_has_no_progress_grad(self):
        g = jax.grad(lambda p: pe_weight(p, 4, (0.1, 0.5)).sum())(jnp.array(0.3))
        assert float(g) == 0.0


class TestNeRF:
    def test_phase_output_keys(self):
        params = init_nerf(jax.random.PRNGKey(0), CFG)
        inputs = make_inputs(jax.random.PRNGKey(1))
        common = dict(sched_mult=jnp.array(0.5), progress=jnp.array(0.3))
        out0 = apply_nerf(params, CFG, inputs, phase=0, **common)
        assert set(out0) == {"s_sigma", "s_feat", "c_sigma", "c_feat"}
        out1 = apply_nerf(params, CFG, inputs, phase=1, **common)
        assert set(out1) == {"s_sigma", "s_feat", "c_sigma", "c_feat", "s_rgb"}
        out2 = apply_nerf(params, CFG, inputs, phase=2, **common)
        assert set(out2) == {"s_sigma", "s_feat", "s_rgb"}
        # TTO: candidate disabled on a candidate-trained model
        out_tto = apply_nerf(
            params, CFG, inputs, phase=1, encode_candidate=False, **common
        )
        assert set(out_tto) == {"s_sigma", "s_feat", "s_rgb"}

    def test_ranges_and_shapes(self):
        params = init_nerf(jax.random.PRNGKey(0), CFG)
        inputs = make_inputs(jax.random.PRNGKey(1), B=10)
        out = apply_nerf(
            params, CFG, inputs, phase=1,
            sched_mult=jnp.array(0.5), progress=jnp.array(0.3),
        )
        assert out["s_sigma"].shape == (10,)
        assert out["s_feat"].shape == (10, CFG.feat_dim)
        assert out["s_rgb"].shape == (10, 3)
        assert (np.asarray(out["s_sigma"]) >= 0).all()  # Softplus
        assert (np.asarray(out["c_sigma"]) >= 0).all()
        rgb = np.asarray(out["s_rgb"])
        assert (rgb >= 0).all() and (rgb <= 1).all()  # Sigmoid

    def test_batched_3d_inputs(self):
        # The renderer feeds (R, S, C) shaped inputs straight through.
        params = init_nerf(jax.random.PRNGKey(0), CFG)
        flat = make_inputs(jax.random.PRNGKey(1), B=12)
        shaped = {k: v.reshape(3, 4, -1) for k, v in flat.items()}
        common = dict(phase=1, sched_mult=jnp.array(0.5), progress=jnp.array(0.3))
        out_flat = apply_nerf(params, CFG, flat, **common)
        out_shaped = apply_nerf(params, CFG, shaped, **common)
        np.testing.assert_allclose(
            np.asarray(out_shaped["s_rgb"].reshape(12, 3)),
            np.asarray(out_flat["s_rgb"]),
            atol=1e-5,
        )

    def test_no_feat_config(self):
        cfg = CFG._replace(encode_feat=False, feat_dim=0)
        params = init_nerf(jax.random.PRNGKey(0), cfg)
        inputs = make_inputs(jax.random.PRNGKey(1), cfg=cfg)
        out = apply_nerf(
            params, cfg, inputs, phase=1,
            sched_mult=jnp.array(0.5), progress=jnp.array(0.3),
        )
        assert "c_rgb" in out and "s_rgb" in out and "s_feat" not in out


class TestTransient:
    def test_shapes_and_beta_floor(self):
        cfg = TransientConfig(beta_min=0.1, transient_dim=16, feat_dim=16)
        params = init_transient(jax.random.PRNGKey(0), cfg, n_images=5)
        feat = jax.random.normal(jax.random.PRNGKey(1), (7, 16))
        idx = jnp.array([0, 1, 2, 3, 4, 0, 1])
        out = apply_transient(params, cfg, feat, idx)
        assert out["alpha"].shape == (7,)
        assert out["rgb"].shape == (7, 3)
        assert out["beta"].shape == (7,)
        a = np.asarray(out["alpha"])
        assert (a >= 0).all() and (a <= 1).all()
        assert (np.asarray(out["beta"]) >= cfg.beta_min - 1e-6).all()
