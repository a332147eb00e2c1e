"""LPIPS (AlexNet backbone) in JAX.

The reference uses the `lpips` package's AlexNet variant as a module-level
global (utils/metric.py:7). That package downloads torch weights; this
environment is zero-egress, so here the *architecture* is implemented in
JAX and the weights load from an `.npz` asset:

  1. On a machine with the `lpips` pip package, run
     `python -m upnerf.cli.convert_lpips out.npz`
  2. Point `UPNERF_LPIPS_WEIGHTS=/path/to/out.npz` (or pass the path).

Without weights, `load_lpips()` returns None and eval reports PSNR/SSIM
only (clearly marked). Architecture (lpips v0.1 alex):

  input in [-1, 1], normalized by shift (-.030, -.088, -.188) /
  scale (.458, .448, .450); AlexNet features after each of the 5 ReLU
  stages; unit-normalize channels; squared diff; 1x1 linear head per stage;
  spatial average; sum over stages.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, padding), with maxpool
# (k=3, s=2) before convs 1, 2, 4 indices per torchvision AlexNet.features.
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    """Callable LPIPS distance. Images are (H, W, 3) in [0, 1]."""

    def __init__(self, weights: Dict[str, np.ndarray]):
        self.w = {k: jnp.asarray(v) for k, v in weights.items()}
        self._jit = jax.jit(self._distance)

    # -- forward ------------------------------------------------------------
    def _alex_features(self, x: jnp.ndarray):
        """x: (1, 3, H, W) normalized. Returns the 5 stage activations."""
        feats = []
        h = x
        for i, (_, k, s, p) in enumerate(_ALEX):
            if i in (1, 2):  # maxpool precedes conv1 and conv2 (lpips slices)
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
            h = jax.lax.conv_general_dilated(
                h,
                self.w[f"conv{i}_w"],
                (s, s),
                [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + self.w[f"conv{i}_b"][None, :, None, None]
            h = jax.nn.relu(h)
            feats.append(h)
        return feats

    def _distance(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        def prep(im):
            x = im * 2.0 - 1.0  # [0,1] -> [-1,1]
            x = (x - _SHIFT) / _SCALE
            return jnp.transpose(x, (2, 0, 1))[None]  # (1, 3, H, W)

        f0 = self._alex_features(prep(img0))
        f1 = self._alex_features(prep(img1))
        total = jnp.zeros(())
        for i, (a, b) in enumerate(zip(f0, f1)):
            a = a / jnp.sqrt((a**2).sum(1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt((b**2).sum(1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = self.w[f"lin{i}"]  # (C,) nonneg 1x1 head
            total = total + (diff * lin[None, :, None, None]).sum(1).mean()
        return total

    def __call__(self, img0, img1) -> float:
        return float(self._jit(jnp.asarray(img0), jnp.asarray(img1)))


def load_lpips(path: Optional[str] = None) -> Optional[LPIPS]:
    path = path or os.environ.get("UPNERF_LPIPS_WEIGHTS")
    if path is None or not os.path.isfile(path):
        return None
    data = dict(np.load(path))
    return LPIPS(data)


def convert_from_torch(out_path: str) -> None:
    """Convert `lpips` pip-package AlexNet weights to the npz asset.

    Run on a machine with lpips + torch installed."""
    import lpips as lpips_pkg  # type: ignore

    model = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] + [
        m for m in model.net.slice3
    ] + [m for m in model.net.slice4] + [m for m in model.net.slice5]
    import torch

    conv_i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{conv_i}_w"] = m.weight.detach().numpy()
            out[f"conv{conv_i}_b"] = m.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate([model.lin0, model.lin1, model.lin2, model.lin3, model.lin4]):
        w = lin.model[1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}"] = w[0, :, 0, 0]
    np.savez(out_path, **out)
