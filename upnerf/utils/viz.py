"""Visualization: depth colormaps, PCA feature images, camera-pose plots.

Mirrors utils/visualization.py:7-30 (JET-colormapped depth, 3-component PCA
feature projection) and utils/pose_visualization.py (3-D camera frusta,
estimated vs GT with error lines) without the cv2 dependency — the JET
colormap is evaluated directly and plots use matplotlib.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """OpenCV-style JET colormap for x in [0, 1] -> (..., 3) float in [0, 1]."""
    v = 4.0 * np.clip(x, 0.0, 1.0)
    r = np.clip(np.minimum(v - 1.5, -v + 4.5), 0, 1)
    g = np.clip(np.minimum(v - 0.5, -v + 3.5), 0, 1)
    b = np.clip(np.minimum(v + 0.5, -v + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def visualize_depth(
    depth: np.ndarray, min_max: Optional[Tuple[float, float]] = None
) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8 JET image (utils/visualization.py:7-23)."""
    x = np.nan_to_num(np.asarray(depth, np.float32))
    if min_max is None:
        mi, ma = float(x.min()), float(x.max())
    else:
        mi, ma = min_max
    x = np.clip((x - mi) / (ma - mi + 1e-8), 0, 1)
    return (_jet(x) * 255).astype(np.uint8)


def get_pca_img(feat: np.ndarray, mean: np.ndarray, components: np.ndarray):
    """(H, W, C) features + PCA (mean, 3xC components) -> (H, W, 3) in [0,1]
    (utils/visualization.py:26-30)."""
    pc = (feat - mean[None, None, :]) @ components.T
    M, m = pc.max(), pc.min()
    return (pc - m) / (M - m + 1e-12)


def get_camera_mesh(pose: np.ndarray, depth: float = 0.5) -> np.ndarray:
    """Camera frustum wireframe vertices in world coords, (5, 3):
    4 image corners + center (utils/pose_visualization.py:179-199 shape)."""
    corners = (
        np.array(
            [[-0.5, -0.5, 1], [0.5, -0.5, 1], [0.5, 0.5, 1], [-0.5, 0.5, 1], [0, 0, 0]]
        )
        * depth
    )
    R, t = pose[:, :3], pose[:, 3]
    return corners @ R.T + t


def get_pose_image(
    poses: np.ndarray, gt_poses: np.ndarray, path: Optional[str] = None
) -> np.ndarray:
    """3-D plot of estimated (blue) vs GT (magenta) camera frusta with red
    error lines between centers (utils/pose_visualization.py:353-427).
    Returns an (H, W, 3) uint8 image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(5, 5), dpi=100)
    ax = fig.add_subplot(111, projection="3d")
    order = [0, 1, 2, 3, 0, 4, 1, 2, 4, 3]
    for pose, color in [(gt_poses, "magenta"), (poses, "blue")]:
        for p in np.asarray(pose):
            m = get_camera_mesh(p)
            ax.plot(m[order, 0], m[order, 1], m[order, 2], color=color, lw=0.7)
    for p_est, p_gt in zip(np.asarray(poses), np.asarray(gt_poses)):
        c0, c1 = p_est[:, 3], p_gt[:, 3]
        ax.plot(*zip(c0, c1), color="red", lw=0.8)
    ax.set_box_aspect([1, 1, 1])
    fig.tight_layout()
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    if path is not None:
        fig.savefig(path)
    plt.close(fig)
    return img
