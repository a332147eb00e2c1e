"""Host-side image / map loading helpers (no cv2/torch dependencies).

Semantics match the reference dataloaders: LANCZOS downscale by integer
factor (datasets/phototourism.py:249-252), float bilinear resize of DPT
inverse-depth maps (cv2.resize default, datasets/phototourism.py:321), and
the reference's per-image inverse-depth normalization.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image


def load_rgb_u8(path: str, downscale: int = 1) -> np.ndarray:
    """(H, W, 3) uint8, LANCZOS-downscaled by integer factor."""
    img = Image.open(path).convert("RGB")
    if downscale > 1:
        w, h = img.size
        img = img.resize((w // downscale, h // downscale), Image.LANCZOS)
    return np.asarray(img, np.uint8)


def resize_bilinear(arr: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """Float bilinear resize to (W, H); channels preserved (cv2.resize
    equivalent used by the reference for depth/feat maps)."""
    w, h = wh
    if arr.ndim == 2:
        return np.asarray(
            Image.fromarray(arr.astype(np.float32), mode="F").resize(
                (w, h), Image.BILINEAR
            )
        )
    chans = [
        np.asarray(
            Image.fromarray(arr[..., c].astype(np.float32), mode="F").resize(
                (w, h), Image.BILINEAR
            )
        )
        for c in range(arr.shape[-1])
    ]
    return np.stack(chans, axis=-1)


def normalize_inv_depth(
    inv_depth: np.ndarray, near: float, far: float
) -> np.ndarray:
    """Reference DPT normalization (datasets/phototourism.py:318-320):
    negatives -> 0, then rescale to [1/far, 1/near] by the per-image max."""
    d = inv_depth.astype(np.float32).copy()
    d[d < 0] = 0
    M, m = 1.0 / near, 1.0 / far
    return d / max(d.max(), 1e-12) * (M - m) + m


def load_feat_map(path: str) -> np.ndarray:
    """(h, w, C) float32, L2-normalized per pixel
    (datasets/phototourism.py:283-288)."""
    feat = np.load(path).astype(np.float32)
    return feat / np.linalg.norm(feat, axis=-1, keepdims=True)


def npy_name(image_name: str) -> str:
    """image file name -> .npy artifact name (datasets/phototourism.py:282)."""
    base = os.path.basename(image_name)
    stem, _ = os.path.splitext(base)
    return stem + ".npy"
