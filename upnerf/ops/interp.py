"""On-device bilinear gathers from per-image feature / depth map stacks.

The reference interpolates DINO features per ray on the CPU dataloader
(datasets/phototourism.py:430-453). TPU-first redesign: the (N_images, h, w,
C) feature stack lives in device HBM (bf16) and per-ray features are
gathered *inside the jitted step* — 2048 rays x 4 texels is a trivial
gather, and it removes hundreds of MB/s of host->device feature traffic.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_gather(
    maps: jnp.ndarray,  # (N, h, w, C)
    img_idx: jnp.ndarray,  # (B,) int
    u: jnp.ndarray,  # (B,) row coordinate in [0, 1]
    v: jnp.ndarray,  # (B,) col coordinate in [0, 1]
) -> jnp.ndarray:
    """Bilinear sample maps[img_idx] at normalized (u=row, v=col).

    Matches datasets/phototourism.py:430-453 (coords scale by size - 1),
    with one intentional fix: at the exact bottom/right edge the reference's
    clamping makes all four weights zero, so edge pixels get a zero feature
    (datasets/phototourism.py:434-445); here the base texel clamps to size-2
    instead, giving the correct edge value. Returns (B, C) float32.
    """
    _, h, w, _ = maps.shape
    y = u.astype(jnp.float32) * (h - 1)
    x = v.astype(jnp.float32) * (w - 1)
    y1 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, max(h - 2, 0))
    x1 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, max(w - 2, 0))
    y2 = jnp.minimum(h - 1, y1 + 1)
    x2 = jnp.minimum(w - 1, x1 + 1)

    p11 = maps[img_idx, y1, x1].astype(jnp.float32)
    p12 = maps[img_idx, y1, x2].astype(jnp.float32)
    p21 = maps[img_idx, y2, x1].astype(jnp.float32)
    p22 = maps[img_idx, y2, x2].astype(jnp.float32)

    y1f = y1.astype(jnp.float32)
    x1f = x1.astype(jnp.float32)
    y2f = y2.astype(jnp.float32)
    x2f = x2.astype(jnp.float32)
    w11 = ((y2f - y) * (x2f - x))[:, None]
    w12 = ((y2f - y) * (x - x1f))[:, None]
    w21 = ((y - y1f) * (x2f - x))[:, None]
    w22 = ((y - y1f) * (x - x1f))[:, None]
    return w11 * p11 + w12 * p12 + w21 * p21 + w22 * p22
