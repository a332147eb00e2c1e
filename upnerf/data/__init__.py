"""Data layer: scene metadata, compact ray store, cache, loaders.

Entry point: `load_training_data(hparams)` — resolves the dataset family
(phototourism | custom, datasets/__init__.py:6-11), loads (or builds) the
compact ray store, applies the camera-noise mode, and returns device-ready
numpy arrays plus the SceneMeta.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import cache, colmap, images, scene, synthetic
from .cache import cache_dir_for, load_cache, save_cache
from .scene import SceneMeta, build_arrays, load_custom, load_phototourism

__all__ = [
    "SceneMeta",
    "build_arrays",
    "cache",
    "cache_dir_for",
    "colmap",
    "images",
    "load_cache",
    "load_custom",
    "load_phototourism",
    "load_training_data",
    "load_scene_meta",
    "save_cache",
    "scene",
    "synthetic",
]


def load_scene_meta(hp: Dict[str, Any], camera_noise="use_hparams") -> SceneMeta:
    name = hp["dataset_name"]
    noise = hp["pose.noise"] if camera_noise == "use_hparams" else camera_noise
    scale = hp["phototourism.img_downscale"]
    if name == "phototourism":
        return load_phototourism(
            hp["root_dir"], hp["scene_name"], scale, camera_noise=noise
        )
    if name == "custom":
        return load_custom(hp["root_dir"], scale, camera_noise=noise)
    raise KeyError(f"unknown dataset {name!r}")


def load_training_data(
    hp: Dict[str, Any]
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], SceneMeta]:
    """(scene_np, store_np, meta) for the train split.

    With phototourism.use_cache, arrays come from the memmap cache (built by
    cli.prepare_cache) and the noise-mode overrides are applied after
    loading, mirroring datasets/phototourism.py:213-236: identity (or
    noised) poses and global near/far replace the cached COLMAP values.
    """
    meta = load_scene_meta(hp)
    near, far = hp["nerf.near"], hp["nerf.far"]
    use_cache = hp.get("phototourism.use_cache", False)
    cdir = cache_dir_for(hp["root_dir"], meta.scale)

    if use_cache and os.path.isdir(cdir):
        _, scene_np, store_np = load_cache(cdir)
        scene_np = dict(scene_np)
        n = len(meta.img_ids_train)
        # noise-mode overrides (datasets/phototourism.py:234-236, 199-211)
        if meta.camera_noise is not None:
            scene_np["near_far"] = np.tile(
                np.array([[near, far]], np.float32), (n, 1)
            )
        scene_np["poses"] = np.stack(
            [np.asarray(meta.poses_dict[i], np.float32) for i in meta.img_ids_train]
        )
        return scene_np, store_np, meta

    feat_dir = hp.get("feat_dir")
    depth_dir = hp.get("depth_dir")
    scene_np, store_np = build_arrays(meta, feat_dir, depth_dir, near, far)
    return scene_np, store_np, meta
