"""Ray-store cache: memmap-able .npy artifacts instead of pickles.

The reference pickles every buffer (prepare_phototourism.py:53-97,
tens of GB at downscale 1) and unpickles them fully into RAM
(datasets/phototourism.py:213-236). Here each array is its own .npy so
loading is O(1) via np.load(mmap_mode="r"); the compact store (u16/u8/f16)
is ~4x smaller than the reference's float32 buffers. The cache stores the
*COLMAP-derived* poses and per-image near/far (built with camera_noise=None,
matching prepare_phototourism.py:44-52); noise modes are applied after
loading, exactly as the reference overrides them at train time
(datasets/phototourism.py:234-236).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .scene import SceneMeta

CACHE_VERSION = 1

_SCENE_KEYS = ["Ks", "poses", "near_far", "wh", "feat_maps", "ray_offsets"]
_STORE_KEYS = ["px", "py", "img_idx", "rgb", "inv_depth"]


def cache_dir_for(root_dir: str, scale: int) -> str:
    return os.path.join(root_dir, "cache_tpu", f"scale{scale}")


def save_cache(
    cache_dir: str,
    meta: SceneMeta,
    scene_np: Dict[str, Optional[np.ndarray]],
    store_np: Dict[str, np.ndarray],
) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    for k in _SCENE_KEYS:
        v = scene_np.get(k)
        if v is not None:
            np.save(os.path.join(cache_dir, f"{k}.npy"), v)
    for k in _STORE_KEYS:
        np.save(os.path.join(cache_dir, f"{k}.npy"), store_np[k])
    np.save(os.path.join(cache_dir, "xyz_world.npy"), meta.xyz_world)
    info = {
        "version": CACHE_VERSION,
        "scale": meta.scale,
        "img_ids": [str(i) for i in meta.img_ids],
        "img_ids_train": [str(i) for i in meta.img_ids_train],
        "img_ids_test": [str(i) for i in meta.img_ids_test],
        "image_paths": {str(k): v for k, v in meta.image_paths.items()},
        "nears": {str(k): v for k, v in meta.nears.items()},
        "fars": {str(k): v for k, v in meta.fars.items()},
        "image_dir": os.path.relpath(meta.image_dir, meta.root_dir),
    }
    with open(os.path.join(cache_dir, "meta.json"), "w") as f:
        json.dump(info, f)
    # GT poses (+ intrinsics) for ALL tsv images, for eval/TTO.
    all_Ks = np.stack([meta.Ks[i] for i in meta.img_ids]).astype(np.float32)
    all_poses = np.stack(
        [np.asarray(meta.poses_dict[i], np.float32) for i in meta.img_ids]
    )
    np.save(os.path.join(cache_dir, "all_Ks.npy"), all_Ks)
    np.save(os.path.join(cache_dir, "all_poses.npy"), all_poses)


def load_cache(
    cache_dir: str, mmap: bool = True
) -> Tuple[dict, Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Returns (info dict, scene_np, store_np)."""
    with open(os.path.join(cache_dir, "meta.json")) as f:
        info = json.load(f)
    assert info["version"] == CACHE_VERSION
    mode = "r" if mmap else None

    def _load(name):
        p = os.path.join(cache_dir, f"{name}.npy")
        return np.load(p, mmap_mode=mode) if os.path.exists(p) else None

    scene_np = {k: _load(k) for k in _SCENE_KEYS}
    store_np = {k: _load(k) for k in _STORE_KEYS}
    info["all_Ks"] = _load("all_Ks")
    info["all_poses"] = _load("all_poses")
    info["xyz_world"] = _load("xyz_world")
    return info, scene_np, store_np
