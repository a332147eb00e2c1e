"""Golden-value SSIM tests (VERDICT r1 next-round #4).

kornia is not installed here, so the goldens come from an independent
float64 numpy implementation of kornia's documented ssim algorithm
(kornia.metrics.ssim: 2-D gaussian window (ws, 1.5), filter2d with
border_type='reflect', standard SSIM map, mean reduction; the reference
reports 1 - 2 * ssim_loss = mean map, /root/reference/utils/metric.py:23-30).
The scalars are HARDCODED so a convention slip in either implementation
(kernel, padding, reduction) breaks the test rather than drifting both
sides together.
"""

import jax.numpy as jnp
import numpy as np

from upnerf.evaluate.metrics import ssim


def _gaussian(size, sigma):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filt2d_reflect(img, k):
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    x = np.pad(img, ((ph, ph), (pw, pw), (0, 0)), mode="reflect")
    H, W, _ = img.shape
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(kh):
        for j in range(kw):
            out += k[i, j] * x[i:i + H, j:j + W]
    return out


def ssim_numpy(a, b, ws=3, sigma=1.5, max_val=1.0):
    """Independent float64 twin of kornia.metrics.ssim (mean map)."""
    g = _gaussian(ws, sigma)
    k = np.outer(g, g)
    C1, C2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    mu_a, mu_b = _filt2d_reflect(a, k), _filt2d_reflect(b, k)
    s_aa = _filt2d_reflect(a * a, k) - mu_a**2
    s_bb = _filt2d_reflect(b * b, k) - mu_b**2
    s_ab = _filt2d_reflect(a * b, k) - mu_a * mu_b
    num = (2 * mu_a * mu_b + C1) * (2 * s_ab + C2)
    den = (mu_a**2 + mu_b**2 + C1) * (s_aa + s_bb + C2)
    return float((num / den).mean())


def _fixed_images():
    rng = np.random.RandomState(42)
    a = rng.rand(8, 9, 3)
    b = np.clip(a + rng.randn(8, 9, 3) * 0.1, 0, 1)
    c = rng.rand(8, 9, 3)
    x = np.linspace(0, 1, 9)[None, :, None] * np.ones((8, 9, 3))
    y = np.clip(x + 0.05, 0, 1)
    return a, b, c, x, y


# precomputed with ssim_numpy above (float64); rerun it to re-derive
GOLDEN = {
    "noisy": 0.9445263187834264,
    "identical": 1.0,
    "unrelated": -0.06631865738553926,
    "gradient_shift": 0.9629724721975644,
}


class TestSSIMGolden:
    def test_goldens_still_derive_from_numpy_twin(self):
        a, b, c, x, y = _fixed_images()
        assert abs(ssim_numpy(a, b) - GOLDEN["noisy"]) < 1e-12
        assert abs(ssim_numpy(a, a) - GOLDEN["identical"]) < 1e-12
        assert abs(ssim_numpy(a, c) - GOLDEN["unrelated"]) < 1e-12
        assert abs(ssim_numpy(x, y) - GOLDEN["gradient_shift"]) < 1e-12

    def test_repo_ssim_matches_goldens(self):
        a, b, c, x, y = _fixed_images()
        for (p, q), key in [
            ((a, b), "noisy"),
            ((a, a), "identical"),
            ((a, c), "unrelated"),
            ((x, y), "gradient_shift"),
        ]:
            got = float(
                ssim(jnp.asarray(p, jnp.float32), jnp.asarray(q, jnp.float32))
            )
            assert abs(got - GOLDEN[key]) < 2e-6, (key, got, GOLDEN[key])
