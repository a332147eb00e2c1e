"""Weight-converter layout checks: torch state_dict -> npz -> JAX forward.

Builds a tiny DINO-style ViT state_dict with torch, runs a reference torch
forward implementing timm/DINO semantics, converts via
upnerf.features.convert, and compares the JAX forward — this catches
transpose/layout mistakes in the converter (OIHW vs HWIO convs, W vs W.T
linears, pos-embed handling) without needing the real checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upnerf.features import vit  # noqa: E402
from upnerf.features.convert import _vit_from_timm_state  # noqa: E402
from upnerf.features.dino import _unflatten  # noqa: E402

CFG = vit.ViTConfig(patch_size=4, dim=32, depth=2, heads=4, base_grid=4)


def make_torch_state(seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "patch_embed.proj.weight": r(CFG.dim, 3, CFG.patch_size, CFG.patch_size),
        "patch_embed.proj.bias": r(CFG.dim),
        "cls_token": r(1, 1, CFG.dim),
        "pos_embed": r(1, 1 + CFG.base_grid**2, CFG.dim),
        "norm.weight": torch.ones(CFG.dim) + 0.1 * r(CFG.dim),
        "norm.bias": r(CFG.dim),
    }
    for i in range(CFG.depth):
        b = f"blocks.{i}."
        sd[b + "norm1.weight"] = torch.ones(CFG.dim) + 0.1 * r(CFG.dim)
        sd[b + "norm1.bias"] = r(CFG.dim)
        sd[b + "attn.qkv.weight"] = r(3 * CFG.dim, CFG.dim)
        sd[b + "attn.qkv.bias"] = r(3 * CFG.dim)
        sd[b + "attn.proj.weight"] = r(CFG.dim, CFG.dim)
        sd[b + "attn.proj.bias"] = r(CFG.dim)
        sd[b + "norm2.weight"] = torch.ones(CFG.dim) + 0.1 * r(CFG.dim)
        sd[b + "norm2.bias"] = r(CFG.dim)
        sd[b + "mlp.fc1.weight"] = r(4 * CFG.dim, CFG.dim)
        sd[b + "mlp.fc1.bias"] = r(4 * CFG.dim)
        sd[b + "mlp.fc2.weight"] = r(CFG.dim, 4 * CFG.dim)
        sd[b + "mlp.fc2.bias"] = r(CFG.dim)
    return sd


def torch_vit_forward(sd, img):
    """Reference timm/DINO forward (patch-stride == patch-size case)."""
    import torch.nn.functional as F

    x = torch.from_numpy(np.asarray(img)).permute(2, 0, 1)[None]  # (1,3,H,W)
    t = F.conv2d(
        x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
        stride=CFG.patch_size,
    )
    B, D, gh, gw = t.shape
    t = t.flatten(2).transpose(1, 2)  # (1, N, D)
    t = torch.cat([sd["cls_token"].expand(B, -1, -1), t], dim=1)
    t = t + sd["pos_embed"]

    for i in range(CFG.depth):
        b = f"blocks.{i}."
        h = F.layer_norm(t, (D,), sd[b + "norm1.weight"], sd[b + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, CFG.heads, D // CFG.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (D // CFG.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, D)
        h = F.linear(h, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        t = t + h
        h = F.layer_norm(t, (D,), sd[b + "norm2.weight"], sd[b + "norm2.bias"], eps=1e-6)
        h = F.linear(h, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        t = t + h
    t = F.layer_norm(t, (D,), sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    return t.detach().numpy()


def test_converted_vit_matches_torch_forward():
    sd = make_torch_state()
    flat = _vit_from_timm_state(sd)
    params = _unflatten({k: np.asarray(v) for k, v in flat.items()})

    img = np.random.RandomState(1).randn(16, 16, 3).astype(np.float32)
    ref = torch_vit_forward(sd, img)
    out = vit.forward_features(
        params, CFG, jnp.asarray(img), stride=CFG.patch_size
    )
    np.testing.assert_allclose(
        np.asarray(out["tokens"]), ref, atol=2e-5
    )
