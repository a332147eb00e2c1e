"""Synthetic on-disk scene generator (test fixture / smoke-test path).

The reference ships a 3-image toy scene (data/example, README.md:54-57) but
no DINO/DPT artifacts for it. This generator writes a fully self-contained
custom-format scene — JPEG images, metadata.json, DINO feature maps + PCA
infos, DPT inverse-depth maps — so the end-to-end train/tto/eval path can be
exercised hermetically (SURVEY.md §4). Optionally also writes the same scene
as a Phototourism layout (tsv + COLMAP binaries) to test that pipeline.
"""

from __future__ import annotations

import json
import os
import numpy as np
from PIL import Image

from . import colmap


def _camera_ring(n: int, radius: float = 3.0, height: float = 0.6, arc: float = 0.2):
    """c2w poses (right-up-back) on a ring looking at the origin.

    arc: fraction of the full circle spanned. Small arcs give heavy view
    overlap (easy photometry, but pose recovery from identity init is
    ill-conditioned when many cameras nearly coincide); use ~0.5 for
    pose-convergence testbeds."""
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / max(n, 1) * arc
        eye = np.array([radius * np.sin(ang), height, radius * np.cos(ang)])
        forward = -eye / np.linalg.norm(eye)  # toward origin
        right = np.cross(forward, np.array([0.0, 1.0, 0.0]))
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        # columns: x right, y up, z back (-forward)
        R = np.stack([right, up, -forward], axis=1)
        poses.append(np.concatenate([R, eye[:, None]], 1))
    return np.stack(poses).astype(np.float32)


def _render_image(pose: np.ndarray, K: np.ndarray, H: int, W: int):
    """Analytic scene: a colored unit sphere at the origin over a gradient
    background; returns (rgb u8, inverse depth)."""
    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack(
        [
            (ii - K[0, 2]) / K[0, 0],
            -(jj - K[1, 2]) / K[1, 1],
            -np.ones_like(ii, np.float64),
        ],
        -1,
    )
    R, t = pose[:, :3], pose[:, 3]
    d = dirs @ R.T
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = t

    # ray-sphere intersection, radius 1 at origin
    b = 2 * (d @ o)
    c = o @ o - 1.0
    disc = b**2 - 4 * c
    hit = disc > 0
    tt = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0))) / 2, 0.0)
    p = o + d * tt[..., None]
    normal = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)

    rgb = np.empty((H, W, 3), np.float32)
    # background: direction-based gradient
    rgb[..., 0] = 0.5 + 0.5 * d[..., 0]
    rgb[..., 1] = 0.5 + 0.5 * d[..., 1]
    rgb[..., 2] = 0.6
    sphere_rgb = 0.5 + 0.5 * normal
    rgb[hit] = sphere_rgb[hit]

    depth = np.where(hit, tt, 6.0)
    inv_depth = 1.0 / np.maximum(depth, 1e-3)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8), inv_depth.astype(np.float32)


def generate_scene(
    out_dir: str,
    n_train: int = 3,
    n_test: int = 1,
    H: int = 40,
    W: int = 48,
    feat_hw: int = 8,
    feat_dim: int = 16,
    focal: float = 40.0,
    seed: int = 0,
    phototourism_layout: bool = False,
    arc: float = 0.2,
) -> dict:
    """Write a complete scene under out_dir; returns the metadata dict."""
    rng = np.random.RandomState(seed)
    n = n_train + n_test
    poses = _camera_ring(n, arc=arc)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    img_dir = os.path.join(out_dir, "dense", "images")
    feat_map_dir = os.path.join(out_dir, "DINO", "feature_maps")
    pca_dir = os.path.join(out_dir, "DINO", "pca_infos")
    dpt_dir = os.path.join(out_dir, "DPT")
    for d in [img_dir, feat_map_dir, pca_dir, dpt_dir]:
        os.makedirs(d, exist_ok=True)

    metadata = {}
    for i in range(n):
        name = f"{i:03d}.jpg"
        rgb, inv_depth = _render_image(poses[i], K, H, W)
        Image.fromarray(rgb).save(os.path.join(img_dir, name), quality=95)

        # "DINO" features: downsampled rgb + positional channels + noise,
        # L2-normalizable; enough structure for the feature loss to learn.
        small = np.asarray(
            Image.fromarray(rgb).resize((feat_hw, feat_hw), Image.BILINEAR),
            np.float32,
        ) / 255.0
        gy, gx = np.meshgrid(
            np.linspace(0, 1, feat_hw), np.linspace(0, 1, feat_hw), indexing="ij"
        )
        base = np.concatenate(
            [small, gy[..., None], gx[..., None]], -1
        )  # (fh, fw, 5)
        reps = int(np.ceil(feat_dim / base.shape[-1]))
        feat = np.tile(base, (1, 1, reps))[..., :feat_dim]
        feat += 0.01 * rng.randn(*feat.shape)
        np.save(os.path.join(feat_map_dir, name[:-4] + ".npy"), feat.astype(np.float32))

        fl = feat.reshape(-1, feat_dim)
        fl = fl / np.linalg.norm(fl, axis=-1, keepdims=True)
        mean = fl.mean(0)
        u, s, vt = np.linalg.svd(fl - mean, full_matrices=False)
        np.save(os.path.join(pca_dir, name[:-4] + "_mean.npy"), mean)
        np.save(os.path.join(pca_dir, name[:-4] + "_components.npy"), vt[:3])

        np.save(os.path.join(dpt_dir, name[:-4] + ".npy"), inv_depth)

        metadata[str(i)] = {
            "name": f"dense/images/{name}",
            "focal": float(focal),
            "split": "train" if i < n_train else "test",
            "c2w": np.concatenate(
                [poses[i], np.array([[0, 0, 0, 1.0]], np.float32)]
            ).tolist(),
        }

    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f)

    if phototourism_layout:
        _write_phototourism_layout(out_dir, metadata, poses, K, n_train, seed)
    return metadata


def _write_phototourism_layout(out_dir, metadata, poses, K, n_train, seed):
    """tsv + COLMAP binaries for the same images (tests the COLMAP path)."""
    rng = np.random.RandomState(seed + 1)
    scene_name = os.path.basename(os.path.normpath(out_dir))
    sparse_dir = os.path.join(out_dir, "dense", "sparse")
    os.makedirs(sparse_dir, exist_ok=True)

    cameras, images = {}, {}
    with open(os.path.join(out_dir, f"{scene_name}.tsv"), "w") as f:
        f.write("filename\tid\tsplit\tdataset\n")
        for i, (id_str, md) in enumerate(metadata.items()):
            name = os.path.basename(md["name"])
            img_id = i + 1
            f.write(f"{name}\t{img_id}\t{md['split']}\t{scene_name}\n")
            cameras[img_id] = colmap.Camera(
                id=img_id,
                model="PINHOLE",
                width=int(K[0, 2] * 2),
                height=int(K[1, 2] * 2),
                params=np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64),
            )
            # c2w right-up-back -> COLMAP w2c right-down-front
            c2w = poses[i].astype(np.float64).copy()
            c2w[:, 1:3] *= -1
            w2c = np.linalg.inv(np.concatenate([c2w, [[0, 0, 0, 1]]]))
            images[img_id] = colmap.Image(
                id=img_id,
                qvec=colmap.rotmat2qvec(w2c[:3, :3]),
                tvec=w2c[:3, 3],
                camera_id=img_id,
                name=name,
                xys=np.zeros((0, 2)),
                point3D_ids=np.zeros(0, np.int64),
            )
    # sparse points: on the unit sphere (in front of all ring cameras)
    pts = rng.randn(256, 3)
    pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    points = {
        j
        + 1: colmap.Point3D(
            id=j + 1,
            xyz=pts[j],
            rgb=np.array([128, 128, 128]),
            error=np.array(0.5),
            image_ids=np.array([1], np.int32),
            point2D_idxs=np.array([0], np.int32),
        )
        for j in range(len(pts))
    }
    colmap.write_cameras_binary(cameras, os.path.join(sparse_dir, "cameras.bin"))
    colmap.write_images_binary(images, os.path.join(sparse_dir, "images.bin"))
    colmap.write_points3d_binary(points, os.path.join(sparse_dir, "points3D.bin"))
