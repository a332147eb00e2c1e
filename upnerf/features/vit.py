"""Vision Transformer backbone (DINO-style) as pure jnp functions.

Supports the dino-vit-features tricks the reference relies on
(preprocess/save_dino_feature.py:17-41):

- patch-embed *stride override* (stride < patch size gives overlapping
  patches and denser token grids),
- bicubic positional-embedding interpolation to the resulting grid,
- per-block intermediate extraction of the attention 'key' facet.

Parameter layout (npz keys; see convert.convert_dino_vit):
  patch_embed/w (P, P, 3, D), patch_embed/b (D,)
  cls_token (1, 1, D), pos_embed (1, 1+N0, D)
  blk{i}/ln1/{scale,bias}, blk{i}/qkv/{w,b}  (D, 3D)
  blk{i}/proj/{w,b}, blk{i}/ln2/{scale,bias}
  blk{i}/mlp1/{w,b} (D, 4D), blk{i}/mlp2/{w,b} (4D, D)
  ln_final/{scale,bias}
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ViTConfig(NamedTuple):
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: int = 4
    base_grid: int = 28  # pretrain grid side (224 / patch)
    # "auto" (flash kernel on TPU above the chunk threshold, else
    # chunked/dense XLA), or force "dense" | "chunked" | "flash".
    attn_impl: str = "auto"


def layer_norm(x, p, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_hw: Tuple[int, int], base_grid: int
) -> jnp.ndarray:
    """Bicubic-resample the (1, 1+N0, D) pos embed to a (gh, gw) token grid
    (the dino-vit-features stride trick)."""
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    d = patch_pe.shape[-1]
    patch_pe = patch_pe.reshape(1, base_grid, base_grid, d)
    gh, gw = grid_hw
    patch_pe = jax.image.resize(patch_pe, (1, gh, gw, d), method="bicubic")
    return jnp.concatenate([cls_pe, patch_pe.reshape(1, gh * gw, d)], axis=1)


def patch_embed(
    x: jnp.ndarray, p: Dict, patch: int, stride: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(1, H, W, 3) image -> (1, N, D) tokens with stride-overridden conv."""
    w = p["patch_embed"]["w"]  # (P, P, 3, D)
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["patch_embed"]["b"]
    _, gh, gw, d = y.shape
    return y.reshape(1, gh * gw, d), (gh, gw)


# Above this token count, dense attention is not viable: the stride-4
# 448x448 grid gives 12,322 tokens, whose dense (H, N, N) score tensor is
# ~3.6 GB — it OOM-pressures HBM and blows remote-compile time. Two big-N
# paths exist: "chunked" (query-chunked lax.map; mathematically identical
# — each row's softmax still spans all keys) and "flash" (the Pallas
# online-softmax kernel in upnerf/ops/pallas_attention.py, which never
# writes scores to HBM at all). "auto" picks flash on TPU, chunked
# elsewhere.
ATTN_CHUNK_THRESHOLD = 4096
ATTN_Q_CHUNK = 1024


def _resolve_attn_impl(impl: str, N: int) -> str:
    if impl == "auto":
        if N <= ATTN_CHUNK_THRESHOLD:
            return "dense"
        return (
            "flash" if jax.default_backend() == "tpu" else "chunked"
        )
    return impl


def attention(x: jnp.ndarray, p: Dict, heads: int, return_keys=False,
              impl: str = "auto"):
    """Standard MHSA; optionally also return the pre-softmax keys
    (B, N, D) with heads concatenated — the 'key' descriptor facet."""
    B, N, D = x.shape
    hd = D // heads
    scale = 1.0 / np.sqrt(hd)
    qkv = x @ p["qkv"]["w"] + p["qkv"]["b"]  # (B, N, 3D)
    qkv = qkv.reshape(B, N, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
    q = jnp.swapaxes(q, 1, 2)  # (B, H, N, hd)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    impl = _resolve_attn_impl(impl, N)
    if impl == "flash":
        from upnerf.ops.pallas_attention import flash_attention

        out = flash_attention(
            q.reshape(B * heads, N, hd),
            k.reshape(B * heads, N, hd),
            v.reshape(B * heads, N, hd),
            scale=scale,
        ).reshape(B, heads, N, hd)
    elif impl == "chunked":
        kT = jnp.swapaxes(k, -2, -1)
        C = ATTN_Q_CHUNK
        n_pad = (-N) % C
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        qc = qp.reshape(B, heads, -1, C, hd)
        qc = jnp.moveaxis(qc, 2, 0)  # (nchunk, B, H, C, hd)

        def body(q_blk):
            s = jax.nn.softmax(q_blk @ kT * scale, -1)  # (B, H, C, N)
            return s @ v

        out = jax.lax.map(body, qc)  # (nchunk, B, H, C, hd)
        out = jnp.moveaxis(out, 0, 2).reshape(B, heads, -1, hd)[:, :, :N]
    else:
        kT = jnp.swapaxes(k, -2, -1)
        attn = jax.nn.softmax(q @ kT * scale, -1)
        out = attn @ v  # (B, H, N, hd)
    out = out.astype(x.dtype)
    out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
    out = out @ p["proj"]["w"] + p["proj"]["b"]
    if return_keys:
        keys = jnp.swapaxes(k, 1, 2).reshape(B, N, D)
        return out, keys
    return out


def block(x, p, heads, return_keys=False, impl: str = "auto"):
    h = layer_norm(x, p["ln1"])
    if return_keys:
        attn_out, keys = attention(h, p, heads, return_keys=True, impl=impl)
    else:
        attn_out = attention(h, p, heads, impl=impl)
        keys = None
    x = x + attn_out
    h = layer_norm(x, p["ln2"])
    h = jax.nn.gelu(h @ p["mlp1"]["w"] + p["mlp1"]["b"], approximate=False)
    h = h @ p["mlp2"]["w"] + p["mlp2"]["b"]
    x = x + h
    return (x, keys) if return_keys else x


def forward_features(
    params: Dict,
    cfg: ViTConfig,
    img: jnp.ndarray,  # (H, W, 3) normalized
    stride: int,
    key_layer: int = None,
    out_layers: Tuple[int, ...] = (),
):
    """Run the ViT; returns dict with:
      tokens  : final-LN tokens (1, 1+N, D)
      keys    : 'key' facet at key_layer (1, 1+N, D) (if key_layer set)
      layers  : {i: pre-norm block outputs} for i in out_layers (DPT hooks)
      grid    : (gh, gw)
    """
    x = img[None]  # (1, H, W, 3)
    tokens, (gh, gw) = patch_embed(x, params, cfg.patch_size, stride)
    cls = jnp.broadcast_to(params["cls_token"], (1, 1, cfg.dim))
    tokens = jnp.concatenate([cls, tokens], axis=1)
    tokens = tokens + interpolate_pos_embed(
        params["pos_embed"], (gh, gw), cfg.base_grid
    )

    out = {"grid": (gh, gw), "layers": {}}
    for i in range(cfg.depth):
        p = params[f"blk{i}"]
        if key_layer is not None and i == key_layer:
            tokens, keys = block(
                tokens, p, cfg.heads, return_keys=True, impl=cfg.attn_impl
            )
            out["keys"] = keys
        else:
            tokens = block(tokens, p, cfg.heads, impl=cfg.attn_impl)
        if i in out_layers:
            out["layers"][i] = tokens
    out["tokens"] = layer_norm(tokens, params["ln_final"])
    return out


def init_vit_params(key: jax.Array, cfg: ViTConfig) -> Dict:
    """Random init (tests / shape-checking only — real use loads converted
    DINO weights)."""
    ks = jax.random.split(key, cfg.depth * 8 + 8)
    it = iter(ks)
    d, m = cfg.dim, cfg.dim * cfg.mlp_ratio

    def lin(k, i, o, scale=0.02):
        return {
            "w": jax.random.normal(k, (i, o)) * scale,
            "b": jnp.zeros((o,)),
        }

    p = {
        "patch_embed": {
            "w": jax.random.normal(next(it), (cfg.patch_size, cfg.patch_size, 3, d))
            * 0.02,
            "b": jnp.zeros((d,)),
        },
        "cls_token": jax.random.normal(next(it), (1, 1, d)) * 0.02,
        "pos_embed": jax.random.normal(
            next(it), (1, 1 + cfg.base_grid**2, d)
        )
        * 0.02,
        "ln_final": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }
    for i in range(cfg.depth):
        p[f"blk{i}"] = {
            "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "qkv": lin(next(it), d, 3 * d),
            "proj": lin(next(it), d, d),
            "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp1": lin(next(it), d, m),
            "mlp2": lin(next(it), m, d),
        }
    return p
