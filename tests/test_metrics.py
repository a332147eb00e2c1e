import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.evaluate import metrics


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(metrics.psnr(a, b)), 20.0, atol=1e-4)

    def test_identical_is_inf(self):
        a = jnp.full((4, 4, 3), 0.3)
        assert float(metrics.psnr(a, a)) == np.inf


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.RandomState(0).rand(16, 16, 3), jnp.float32)
        np.testing.assert_allclose(float(metrics.ssim(img, img)), 1.0, atol=1e-5)

    def test_uncorrelated_lower_than_shifted(self):
        rng = np.random.RandomState(1)
        img = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        noise = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
        slight = jnp.clip(img + 0.02, 0, 1)
        s_noise = float(metrics.ssim(img, noise))
        s_slight = float(metrics.ssim(img, slight))
        assert s_slight > 0.9
        assert s_noise < s_slight

class TestLPIPSArch:
    def test_runs_with_random_weights(self):
        # Architecture smoke: random weights with lpips-alex layer shapes.
        from upnerf.evaluate.lpips import _ALEX, LPIPS

        rng = np.random.RandomState(0)
        w = {}
        in_ch = 3
        for i, (out_ch, k, s, p) in enumerate(_ALEX):
            w[f"conv{i}_w"] = rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.05
            w[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
            w[f"lin{i}"] = np.abs(rng.randn(out_ch)).astype(np.float32) * 0.01
            in_ch = out_ch
        model = LPIPS(w)
        img0 = rng.rand(64, 64, 3).astype(np.float32)
        img1 = rng.rand(64, 64, 3).astype(np.float32)
        d_same = model(img0, img0)
        d_diff = model(img0, img1)
        assert d_same < 1e-6
        assert d_diff > d_same

    def test_load_lpips_returns_none_without_weights(self, monkeypatch):
        from upnerf.evaluate.lpips import load_lpips

        monkeypatch.delenv("UPNERF_LPIPS_WEIGHTS", raising=False)
        assert load_lpips() is None
