"""Scene metadata loading: Phototourism (tsv + COLMAP) and custom
(metadata.json) scenes.

Replicates the reference read_meta pipelines (datasets/phototourism.py:63-211,
datasets/custom.py:62-139): tsv split parsing, intrinsics rescale by integer
downscale, w2c -> c2w with the right-down-front -> right-up-back flip,
per-image near/far from 3-D point depth percentiles (0.1/99.9), global scene
rescale so max far = 5, and the three camera-noise modes:

  noise None : keep COLMAP poses + per-image near/far (cache building, eval)
  noise -1   : pose-prior-free — ALL training poses initialized to identity
               (datasets/phototourism.py:199-202); global near/far
  noise s>0  : compose persisted random se(3) noise of scale s
               (datasets/phototourism.py:203-211); global near/far

The heavy per-ray buffers are built separately (`build_arrays`) into the
compact RayStore layout (see upnerf.train.state).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from upnerf.geometry import se3 as se3_ops
from . import colmap
from .images import load_feat_map, load_rgb_u8, normalize_inv_depth, npy_name, resize_bilinear


@dataclasses.dataclass
class SceneMeta:
    root_dir: str
    image_dir: str
    scale: int
    camera_noise: Optional[float]
    img_ids: List
    image_paths: Dict  # id -> path relative to image_dir
    Ks: Dict  # id -> (3, 3) float32 (rescaled)
    poses_dict: Dict  # id -> (3, 4) training base pose
    GT_poses_dict: Optional[Dict]  # id -> (3, 4) ground-truth pose
    nears: Dict
    fars: Dict
    img_ids_train: List
    img_ids_test: List
    xyz_world: np.ndarray

    @property
    def id2idx(self) -> Dict:
        return {id_: i for i, id_ in enumerate(self.img_ids_train)}

    @property
    def N_images_train(self) -> int:
        return len(self.img_ids_train)

    @property
    def N_images_test(self) -> int:
        return len(self.img_ids_test)


def _apply_camera_noise(meta: SceneMeta) -> None:
    """Mutate poses_dict per the noise mode (datasets/phototourism.py:187-211)."""
    noise = meta.camera_noise
    if noise is None:
        return
    if meta.GT_poses_dict is None:
        # Phototourism: poses_dict currently holds the COLMAP (GT) poses.
        # Custom scenes arrive with GT_poses_dict already set — keep it.
        meta.GT_poses_dict = dict(meta.poses_dict)
    train_poses = np.stack(
        [np.asarray(meta.poses_dict[i], np.float32) for i in meta.img_ids_train]
    )
    if noise == -1:
        eye = np.eye(3, 4, dtype=np.float32)
        for id_ in meta.img_ids_train:
            meta.poses_dict[id_] = eye.copy()
        return
    # Persisted random se(3) noise. The reference saves under ./noises with a
    # save-path typo ('./nosies'); we store alongside the scene instead
    # (normalized quirk, SURVEY.md §7.4).
    noise_file = os.path.join(
        meta.root_dir, "noises", f"{len(train_poses)}_{noise}.npy"
    )
    if os.path.isfile(noise_file):
        pose_noises = np.load(noise_file)
    else:
        rng = np.random.RandomState(0)
        se3_noise = rng.randn(len(train_poses), 6).astype(np.float32) * noise
        pose_noises = np.asarray(se3_ops.se3_to_SE3(se3_noise))
        os.makedirs(os.path.dirname(noise_file), exist_ok=True)
        np.save(noise_file, pose_noises)
    noised = np.asarray(
        se3_ops.compose([pose_noises, train_poses])
    )
    for i, id_ in enumerate(meta.img_ids_train):
        meta.poses_dict[id_] = noised[i]


def _read_colmap_meta(sparse_dir: str):
    """images/cameras metadata via the native C++ reader when built
    (upnerf.native), else the portable Python parser. Returns
    (im_by_id: {id: {qvec, tvec, camera_id, name}},
     cam_params_by_id: {image_id: params})."""
    images_bin = os.path.join(sparse_dir, "images.bin")
    cameras_bin = os.path.join(sparse_dir, "cameras.bin")
    try:
        from upnerf import native

        use_native = native.available()
    except Exception:
        use_native = False
    if use_native:
        from upnerf import native

        im = native.read_images_meta(images_bin)
        cm = native.read_cameras_meta(cameras_bin)
        params_by_cam = {
            int(cid): cm["params"][i] for i, cid in enumerate(cm["ids"])
        }
        im_by_id = {
            int(im["ids"][i]): {
                "qvec": im["qvec"][i],
                "tvec": im["tvec"][i],
                "camera_id": int(im["camera_ids"][i]),
                "name": im["names"][i],
            }
            for i in range(len(im["ids"]))
        }
    else:
        imdata = colmap.read_images_binary(images_bin)
        camdata = colmap.read_cameras_binary(cameras_bin)
        params_by_cam = {cid: c.params for cid, c in camdata.items()}
        im_by_id = {
            id_: {
                "qvec": v.qvec,
                "tvec": v.tvec,
                "camera_id": v.camera_id,
                "name": v.name,
            }
            for id_, v in imdata.items()
        }
    # Phototourism has one camera per image with camera_id == image_id, but
    # resolve through camera_id to stay correct in general.
    cam_params_by_id = {
        id_: params_by_cam[v["camera_id"]] for id_, v in im_by_id.items()
    }
    return im_by_id, cam_params_by_id


def _read_points3d_xyz(path: str) -> np.ndarray:
    try:
        from upnerf import native

        if native.available():
            return native.read_points3d_xyz(path)
    except Exception:
        pass
    return colmap.read_points3d_xyz(path)


def load_phototourism(
    root_dir: str,
    scene_name: str,
    img_downscale: int = 1,
    camera_noise: Optional[float] = -1,
) -> SceneMeta:
    """Parse tsv + COLMAP binaries (datasets/phototourism.py:63-211)."""
    import pandas as pd

    tsv = os.path.join(root_dir, f"{scene_name}.tsv")
    files = pd.read_csv(tsv, sep="\t")
    files = files[~files["id"].isnull()].reset_index(drop=True)

    sparse = os.path.join(root_dir, "dense/sparse")
    im_by_id, cam_params_by_id = _read_colmap_meta(sparse)

    # The tsv 'id' column is broken — map ids via images.bin names
    # (datasets/phototourism.py:71-90).
    name_to_id = {v["name"]: id_ for id_, v in im_by_id.items()}
    img_ids, image_paths = [], {}
    for filename in list(files["filename"]):
        id_ = name_to_id[filename]
        image_paths[id_] = filename
        img_ids.append(id_)

    # Intrinsics, rescaled by integer downscale (datasets/phototourism.py:96-111).
    Ks = {}
    for id_ in img_ids:
        params = cam_params_by_id[id_]
        img_w, img_h = int(params[2] * 2), int(params[3] * 2)
        w_, h_ = img_w // img_downscale, img_h // img_downscale
        K = np.zeros((3, 3), np.float32)
        K[0, 0] = params[0] * w_ / img_w
        K[1, 1] = params[1] * h_ / img_h
        K[0, 2] = params[2] * w_ / img_w
        K[1, 2] = params[3] * h_ / img_h
        K[2, 2] = 1
        Ks[id_] = K

    # w2c -> c2w, right-up-back (datasets/phototourism.py:113-127).
    bottom = np.array([[0, 0, 0, 1.0]])
    w2c_mats = []
    for id_ in img_ids:
        im = im_by_id[id_]
        R = colmap.qvec2rotmat(im["qvec"])
        t = np.asarray(im["tvec"]).reshape(3, 1)
        w2c_mats.append(np.concatenate([np.concatenate([R, t], 1), bottom], 0))
    w2c_mats = np.stack(w2c_mats, 0)
    poses = np.linalg.inv(w2c_mats)[:, :3]
    poses[..., 1:3] *= -1

    # Near/far percentiles + scene rescale (datasets/phototourism.py:129-161).
    xyz_world = _read_points3d_xyz(os.path.join(sparse, "points3D.bin"))
    xyz_world_h = np.concatenate([xyz_world, np.ones((len(xyz_world), 1))], -1)
    nears, fars = {}, {}
    for i, id_ in enumerate(img_ids):
        xyz_cam = (xyz_world_h @ w2c_mats[i].T)[:, :3]
        xyz_cam = xyz_cam[xyz_cam[:, 2] > 0]
        nears[id_] = float(np.percentile(xyz_cam[:, 2], 0.1))
        fars[id_] = float(np.percentile(xyz_cam[:, 2], 99.9))
    max_far = max(fars.values())
    scale_factor = max_far / 5
    poses[..., 3] /= scale_factor
    nears = {k: v / scale_factor for k, v in nears.items()}
    fars = {k: v / scale_factor for k, v in fars.items()}
    xyz_world = xyz_world / scale_factor

    poses_dict = {id_: poses[i] for i, id_ in enumerate(img_ids)}
    split = list(files["split"])
    meta = SceneMeta(
        root_dir=root_dir,
        image_dir=os.path.join(root_dir, "dense/images"),
        scale=img_downscale,
        camera_noise=camera_noise,
        img_ids=img_ids,
        image_paths=image_paths,
        Ks=Ks,
        poses_dict=poses_dict,
        GT_poses_dict=None,
        nears=nears,
        fars=fars,
        img_ids_train=[id_ for i, id_ in enumerate(img_ids) if split[i] == "train"],
        img_ids_test=[id_ for i, id_ in enumerate(img_ids) if split[i] == "test"],
        xyz_world=xyz_world,
    )
    _apply_camera_noise(meta)
    return meta


def load_custom(
    root_dir: str,
    img_downscale: int = 1,
    camera_noise: Optional[float] = -1,
) -> SceneMeta:
    """metadata.json scene (datasets/custom.py:62-139): per-image focal +
    split, optional GT c2w (right-up-back), fixed global near/far."""
    from PIL import Image as PILImage

    with open(os.path.join(root_dir, "metadata.json")) as f:
        metadata = json.load(f)

    img_ids = list(metadata.keys())
    image_paths = {id_: v["name"] for id_, v in metadata.items()}
    Ks = {}
    for id_, v in metadata.items():
        with PILImage.open(os.path.join(root_dir, v["name"])) as im:
            width, height = im.size
        K = np.zeros((3, 3), np.float32)
        K[0, 0] = K[1, 1] = v["focal"] / img_downscale
        K[0, 2] = (width / 2) / img_downscale
        K[1, 2] = (height / 2) / img_downscale
        K[2, 2] = 1
        Ks[id_] = K

    GT_poses = None
    try:
        GT_poses = {
            id_: np.asarray(v["c2w"], np.float32)[:3] for id_, v in metadata.items()
        }
    except KeyError:
        pass

    img_ids_train = [i for i in img_ids if metadata[i]["split"] == "train"]
    img_ids_test = [i for i in img_ids if metadata[i]["split"] == "test"]
    # The reference's custom dataset always trains from identity poses
    # (datasets/custom.py:139) — its noise modes exist only for
    # Phototourism. Extension: when the metadata carries GT poses, support
    # the same perturbation mode (noise s > 0: GT composed with persisted
    # se(3) noise) so perturbation-recovery benchmarks work on synthetic
    # scenes; -1 / None keep the reference's identity behavior.
    if GT_poses is not None and camera_noise is not None and camera_noise != -1:
        poses_dict = {id_: GT_poses[id_][:3, :4].copy() for id_ in img_ids}
    else:
        poses_dict = {id_: np.eye(3, 4, dtype=np.float32) for id_ in img_ids}

    meta = SceneMeta(
        root_dir=root_dir,
        image_dir=root_dir,
        scale=img_downscale,
        camera_noise=camera_noise,
        img_ids=img_ids,
        image_paths=image_paths,
        Ks=Ks,
        poses_dict=poses_dict,
        GT_poses_dict=GT_poses,
        nears={},
        fars={},
        img_ids_train=img_ids_train,
        img_ids_test=img_ids_test,
        xyz_world=np.zeros((0, 3)),
    )
    if camera_noise is not None and camera_noise != -1:
        _apply_camera_noise(meta)
    return meta


def build_arrays(
    meta: SceneMeta,
    feat_dir: Optional[str],
    depth_dir: Optional[str],
    near: float,
    far: float,
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Build the per-image scene tables and the compact per-ray store for
    the TRAIN images (replaces the reference's giant float buffers,
    datasets/phototourism.py:213-323).

    Returns (scene_np, store_np):
      scene_np: Ks (N,3,3), poses (N,3,4), near_far (N,2), wh (N,2),
                feat_maps (N,h,w,C) | None, ray_offsets (N+1,)
      store_np: px/py (uint16), img_idx (int32), rgb (N_rays,3 uint8),
                inv_depth (float16)
    """
    ids = meta.img_ids_train
    n = len(ids)
    Ks = np.stack([meta.Ks[i] for i in ids]).astype(np.float32)
    poses = np.stack([np.asarray(meta.poses_dict[i], np.float32) for i in ids])

    if meta.camera_noise is not None or not meta.nears:
        near_far = np.tile(np.array([[near, far]], np.float32), (n, 1))
    else:  # per-image COLMAP bounds (cache-building mode)
        near_far = np.stack(
            [[meta.nears[i], meta.fars[i]] for i in ids]
        ).astype(np.float32)

    px_l, py_l, idx_l, rgb_l, invd_l, wh_l, feat_l = [], [], [], [], [], [], []
    offsets = [0]
    for k, id_ in enumerate(ids):
        img = load_rgb_u8(
            os.path.join(meta.image_dir, meta.image_paths[id_]), meta.scale
        )
        h, w = img.shape[:2]
        wh_l.append([w, h])
        jj, ii = np.meshgrid(
            np.arange(h, dtype=np.uint16), np.arange(w, dtype=np.uint16),
            indexing="ij",
        )
        px_l.append(ii.ravel())
        py_l.append(jj.ravel())
        idx_l.append(np.full(h * w, k, np.int32))
        rgb_l.append(img.reshape(-1, 3))
        offsets.append(offsets[-1] + h * w)

        if feat_dir is not None:
            feat_l.append(
                load_feat_map(
                    os.path.join(
                        feat_dir, "feature_maps", npy_name(meta.image_paths[id_])
                    )
                )
            )
        if depth_dir is not None:
            invd = np.load(
                os.path.join(depth_dir, npy_name(meta.image_paths[id_]))
            )
            invd = normalize_inv_depth(invd, near, far)
            invd = resize_bilinear(invd, (w, h))
            invd_l.append(invd.reshape(-1).astype(np.float16))

    scene_np = {
        "Ks": Ks,
        "poses": poses,
        "near_far": near_far,
        "wh": np.asarray(wh_l, np.int64),
        "feat_maps": np.stack(feat_l) if feat_l else None,
        "ray_offsets": np.asarray(offsets, np.int64),
    }
    store_np = {
        "px": np.concatenate(px_l),
        "py": np.concatenate(py_l),
        "img_idx": np.concatenate(idx_l),
        "rgb": np.concatenate(rgb_l),
        "inv_depth": (
            np.concatenate(invd_l)
            if invd_l
            else np.zeros(offsets[-1], np.float16)
        ),
    }
    return scene_np, store_np
