"""2-D transient (occluder) network over per-pixel DINO features.

Functional port of the reference TransientNet (models/transient_net.py:5-38):
a per-pixel MLP on the 384-d DINO feature predicts an occluder alpha; the
concatenation with a per-image transient embedding predicts the occluder RGB
and the NeRF-W-style uncertainty beta = Softplus(.) * alpha + beta_min.

The per-image transient embedding table lives in the parameter pytree
(`t_emb`, N_images x transient_dim, N(0,1) init like torch nn.Embedding,
models/transient_net.py:10) and is gathered by ray image index.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from upnerf.ops.linear import dense, init_linear
from .embeddings import init_embedding


class TransientConfig(NamedTuple):
    beta_min: float = 0.1
    transient_dim: int = 128
    feat_dim: int = 384

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "TransientConfig":
        return cls(
            beta_min=hp["t_net.beta_min"],
            transient_dim=hp["t_net.transient_dim"],
            feat_dim=hp["t_net.feat_dim"],
        )


def init_transient(key: jax.Array, cfg: TransientConfig, n_images: int):
    keys = iter(jax.random.split(key, 16))
    hidden = 256
    return {
        "t_emb": init_embedding(next(keys), n_images, cfg.transient_dim),
        "feat_encoder": [
            init_linear(next(keys), cfg.feat_dim, hidden),
            init_linear(next(keys), hidden, hidden),
            init_linear(next(keys), hidden, hidden),
            init_linear(next(keys), hidden, hidden),
        ],
        "final_encoder": init_linear(next(keys), hidden, hidden),
        "t_encoder": init_linear(next(keys), hidden + cfg.transient_dim, 128),
        "alpha_layer": init_linear(next(keys), hidden, 1),
        "beta_layer": init_linear(next(keys), 128, 1),
        "rgb_layer": init_linear(next(keys), 128, 3),
    }


def apply_transient(
    params: Dict[str, Any],
    cfg: TransientConfig,
    feat: jnp.ndarray,
    img_idx: jnp.ndarray,
    precision: str = "high",
) -> Dict[str, jnp.ndarray]:
    """feat (B, feat_dim), img_idx (B,) int -> {alpha, rgb, beta}
    (models/transient_net.py:27-38). alpha/beta returned as (B,)."""
    t_emb = params["t_emb"][img_idx]  # (B, transient_dim)
    h = feat
    for layer in params["feat_encoder"]:
        h = jax.nn.relu(dense(h, layer, precision))
    final = dense(h, params["final_encoder"], precision)  # no ReLU
    temb_in = jax.nn.relu(
        dense(jnp.concatenate([final, t_emb], -1), params["t_encoder"], precision)
    )
    alpha = jax.nn.sigmoid(dense(h, params["alpha_layer"], precision))[..., 0]
    rgb = jax.nn.sigmoid(dense(temb_in, params["rgb_layer"], precision))
    beta = (
        jax.nn.softplus(dense(temb_in, params["beta_layer"], precision))[..., 0] * alpha
        + cfg.beta_min
    )
    return {"alpha": alpha, "rgb": rgb, "beta": beta}
