"""DINO ViT-S/8 dense descriptor extraction.

Replicates the dino-vit-features pipeline the reference drives offline
(preprocess/save_dino_feature.py:17-52): resize to 448x448, ImageNet
normalize, run DINO ViT-S/8 with patch-embed stride overridden to 4
(overlapping patches -> denser grid), take the attention **key** facet at
block 9, drop the CLS token, reshape to (gh, gw, 384), and also fit a
3-component PCA per image for visualization (mean + components .npy).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.data.images import npy_name
from . import vit

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DinoExtractor:
    """facet='key', layer 9, ViT-S/8 with stride 4 — the reference's
    ViTExtractor defaults (preprocess/save_dino_feature.py:18,39)."""

    def __init__(
        self,
        params: Dict,
        cfg: vit.ViTConfig = vit.ViTConfig(),
        stride: int = 4,
        layer: int = 9,
        load_size: int = 448,
    ):
        # device-resident once; passed as a jit ARGUMENT below. A closure
        # capture would bake the weights into the graph as constants, and
        # on remote-compile backends the whole blob serializes to the
        # compiler per cache miss (observed as multi-minute compiles);
        # numpy args would re-upload per call instead.
        self.params = jax.tree.map(jnp.asarray, params)
        self.cfg = cfg
        self.stride = stride
        self.layer = layer
        self.load_size = load_size
        self._jit = jax.jit(self._extract)

    def _extract(self, params, img: jnp.ndarray):
        out = vit.forward_features(
            params, self.cfg, img, self.stride, key_layer=self.layer
        )
        gh, gw = out["grid"]
        keys = out["keys"][0, 1:]  # drop CLS -> (N, D)
        return keys.reshape(gh, gw, -1)

    def preprocess(self, image_u8: np.ndarray) -> jnp.ndarray:
        """(H, W, 3) uint8 -> normalized (load_size, load_size, 3)."""
        from PIL import Image

        img = Image.fromarray(image_u8).resize(
            (self.load_size, self.load_size), Image.BILINEAR
        )
        x = np.asarray(img, np.float32) / 255.0
        return jnp.asarray((x - IMAGENET_MEAN) / IMAGENET_STD)

    def __call__(self, image_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (gh, gw, 384) float32 descriptor map."""
        return np.asarray(self._jit(self.params, self.preprocess(image_u8)))


def pca_info(feat: np.ndarray, n_components: int = 3):
    """Per-image PCA of L2-normalized descriptors
    (preprocess/save_dino_feature.py:42-51). Returns (mean, components)."""
    flat = feat.reshape(-1, feat.shape[-1]).astype(np.float64)
    flat = flat / np.linalg.norm(flat, axis=-1, keepdims=True)
    mean = flat.mean(0)
    _, _, vt = np.linalg.svd(flat - mean, full_matrices=False)
    return mean.astype(np.float32), vt[:n_components].astype(np.float32)


def load_dino(weights_path: Optional[str] = None) -> Optional[DinoExtractor]:
    weights_path = weights_path or os.environ.get("UPNERF_DINO_WEIGHTS")
    if weights_path is None or not os.path.isfile(weights_path):
        return None
    flat = dict(np.load(weights_path))
    params = _unflatten(flat)
    return DinoExtractor(params)


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split("/")
        cur = tree
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = jnp.asarray(v)
    return tree


def save_features(
    extractor: DinoExtractor,
    image_paths,
    save_dir: str,
    log=print,
) -> None:
    """Write <save_dir>/feature_maps/*.npy + pca_infos/*_{mean,components}
  .npy (layout of preprocess/save_dino_feature.py:21-52)."""
    from PIL import Image

    feat_dir = os.path.join(save_dir, "feature_maps")
    pca_dir = os.path.join(save_dir, "pca_infos")
    os.makedirs(feat_dir, exist_ok=True)
    os.makedirs(pca_dir, exist_ok=True)
    for i, path in enumerate(image_paths):
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        feat = extractor(img)
        stem = npy_name(path)[:-4]
        np.save(os.path.join(feat_dir, stem + ".npy"), feat)
        mean, comps = pca_info(feat)
        np.save(os.path.join(pca_dir, stem + "_mean.npy"), mean)
        np.save(os.path.join(pca_dir, stem + "_components.npy"), comps)
        log(f"[dino] {i + 1}/{len(image_paths)} {stem}")
