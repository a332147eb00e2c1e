"""Offline feature extractors: ViT plumbing, DINO descriptor maps, DPT."""

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.features import dino, dpt, vit


TINY = vit.ViTConfig(patch_size=8, dim=32, depth=4, heads=4, base_grid=4)


class TestViT:
    def test_stride_override_grid(self):
        params = vit.init_vit_params(jax.random.PRNGKey(0), TINY)
        img = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3))
        out8 = vit.forward_features(params, TINY, img, stride=8)
        assert out8["grid"] == (4, 4)
        out4 = vit.forward_features(params, TINY, img, stride=4)
        assert out4["grid"] == (7, 7)  # (32-8)/4+1: overlapping patches
        assert out4["tokens"].shape == (1, 1 + 49, 32)

    def test_key_facet_extraction(self):
        params = vit.init_vit_params(jax.random.PRNGKey(0), TINY)
        img = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3))
        out = vit.forward_features(params, TINY, img, stride=8, key_layer=2)
        assert out["keys"].shape == (1, 17, 32)

    def test_pos_embed_interpolation_identity(self):
        pe = jax.random.normal(jax.random.PRNGKey(2), (1, 1 + 16, 8))
        out = vit.interpolate_pos_embed(pe, (4, 4), 4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pe), atol=1e-5)

    def test_hook_layers(self):
        params = vit.init_vit_params(jax.random.PRNGKey(0), TINY)
        img = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3))
        out = vit.forward_features(params, TINY, img, stride=8, out_layers=(0, 3))
        assert set(out["layers"]) == {0, 3}


class TestChunkedAttention:
    def test_chunked_matches_dense(self, monkeypatch):
        """Query-chunked attention (used above ATTN_CHUNK_THRESHOLD tokens;
        the stride-4 448 grid is 12,322 tokens whose dense score tensor is
        ~3.6 GB) must be numerically identical to the dense path."""
        rng = np.random.RandomState(0)
        B, N, D, H = 1, 50, 32, 4
        x = jnp.asarray(rng.randn(B, N, D).astype(np.float32))
        p = {
            "qkv": {"w": jnp.asarray(rng.randn(D, 3 * D).astype(np.float32) * 0.1),
                    "b": jnp.zeros((3 * D,))},
            "proj": {"w": jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
                     "b": jnp.zeros((D,))},
        }
        dense = vit.attention(x, p, H)
        monkeypatch.setattr(vit, "ATTN_CHUNK_THRESHOLD", 16)
        monkeypatch.setattr(vit, "ATTN_Q_CHUNK", 16)  # N=50: pad to 64
        chunked, keys = vit.attention(x, p, H, return_keys=True)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(dense), rtol=1e-5, atol=1e-6
        )
        assert keys.shape == (B, N, D)


class TestDino:
    def test_extractor_end_to_end(self):
        params = vit.init_vit_params(jax.random.PRNGKey(0), TINY)
        ex = dino.DinoExtractor(params, TINY, stride=4, layer=2, load_size=32)
        img = np.random.RandomState(0).randint(0, 255, (50, 60, 3), np.uint8)
        feat = ex(img)
        assert feat.shape == (7, 7, 32)
        assert np.isfinite(feat).all()

    def test_pca_info(self):
        feat = np.random.RandomState(0).randn(6, 6, 16).astype(np.float32)
        mean, comps = dino.pca_info(feat)
        assert mean.shape == (16,) and comps.shape == (3, 16)
        # components are orthonormal
        np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-4)

    def test_load_returns_none_without_weights(self, monkeypatch):
        monkeypatch.delenv("UPNERF_DINO_WEIGHTS", raising=False)
        assert dino.load_dino() is None


class TestDPT:
    def test_forward_shapes(self):
        params, cfg, hooks = dpt.init_dpt_params(jax.random.PRNGKey(0), small=True)
        img = jax.random.normal(jax.random.PRNGKey(1), (64, 64, 3))
        out = dpt.dpt_forward(params, img, cfg=cfg, hooks=hooks)
        assert out.shape == (64, 64)
        o = np.asarray(out)
        assert np.isfinite(o).all()
        assert (o >= 0).all()  # non_negative head

    def test_save_depths_layout(self, tmp_path):
        from PIL import Image

        params, cfg, hooks = dpt.init_dpt_params(jax.random.PRNGKey(0), small=True)
        model = dpt.DPTDepth(params, net_size=64)
        model._jit = jax.jit(
            lambda p, im: dpt.dpt_forward(p, im, cfg=cfg, hooks=hooks)
        )
        img_path = str(tmp_path / "a.jpg")
        Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (40, 48, 3), np.uint8)
        ).save(img_path)
        dpt.save_depths(model, [img_path], str(tmp_path / "DPT"), log=lambda *a: None)
        d = np.load(tmp_path / "DPT" / "a.npy")
        assert d.shape == (40, 48)
