"""LPIPS numeric parity against a torch twin.

The reference computes LPIPS with the `lpips` pip package (AlexNet variant,
utils/metric.py:7), which is torch F.conv2d/F.max_pool2d plus the v0.1
distance pipeline (scaling layer -> 5 feature stages -> channel
unit-normalize -> squared diff -> nonneg 1x1 lin heads -> spatial mean ->
sum over stages). Real pretrained weights cannot be downloaded here, so
this test transplants ONE random manifest-shaped state into both a
hand-built torch twin of that exact pipeline and our JAX LPIPS, and
requires the distances to agree — catching conv padding/stride, pool
placement, normalization-epsilon, and layout-transpose bugs that smoke
tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from upnerf.evaluate.lpips import _ALEX, _SCALE, _SHIFT, LPIPS  # noqa: E402


def _random_weights(rng):
    w, in_ch = {}, 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX):
        w[f"conv{i}_w"] = rng.randn(out_ch, in_ch, k, k).astype(np.float32) * 0.1
        w[f"conv{i}_b"] = rng.randn(out_ch).astype(np.float32) * 0.1
        w[f"lin{i}"] = np.abs(rng.randn(out_ch)).astype(np.float32)
        in_ch = out_ch
    return w


def _torch_lpips(w, img0, img1):
    """lpips v0.1 alex pipeline in torch (lpips/lpips.py forward)."""

    def feats(im):
        x = torch.from_numpy(im).permute(2, 0, 1)[None] * 2.0 - 1.0
        x = (x - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
            _SCALE
        ).view(1, 3, 1, 1)
        outs = []
        for i, (_, k, s, p) in enumerate(_ALEX):
            if i in (1, 2):  # MaxPool2d(3, 2) before conv1/conv2 slices
                x = F.max_pool2d(x, 3, 2)
            x = F.conv2d(
                x, torch.from_numpy(w[f"conv{i}_w"]),
                torch.from_numpy(w[f"conv{i}_b"]), stride=s, padding=p,
            )
            x = F.relu(x)
            outs.append(x)
        return outs

    total = torch.zeros(())
    for i, (a, b) in enumerate(zip(feats(img0), feats(img1))):
        a = a / torch.sqrt((a**2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b**2).sum(1, keepdim=True) + 1e-10)
        diff = (a - b) ** 2
        lin = torch.from_numpy(w[f"lin{i}"]).view(1, -1, 1, 1)
        total = total + (diff * lin).sum(1).mean()
    return float(total)


@pytest.mark.parametrize("hw", [(64, 64), (96, 80)])
def test_distance_matches_torch(hw):
    rng = np.random.RandomState(3)
    w = _random_weights(rng)
    img0 = rng.rand(*hw, 3).astype(np.float32)
    img1 = np.clip(img0 + 0.1 * rng.randn(*hw, 3).astype(np.float32), 0, 1)

    ours = LPIPS(w)(img0, img1)
    ref = _torch_lpips(w, img0, img1)
    assert ref > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def test_identical_images_zero():
    rng = np.random.RandomState(4)
    w = _random_weights(rng)
    img = rng.rand(64, 64, 3).astype(np.float32)
    assert abs(LPIPS(w)(img, img)) < 1e-6
