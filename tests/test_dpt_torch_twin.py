"""DPT torch-twin parity (VERDICT r2 missing #3).

DPT's output — the monocular inverse-depth prior — directly steers pose
optimization, so its numerics get the same treatment as LPIPS
(tests/test_lpips_torch_twin.py) and the DINO ViT converter
(tests/test_convert_parity.py): a hand-built torch implementation of the
published DPT-Large semantics (the reference runs it through the DPT git
submodule, preprocess/save_dpt_depth.py:21-179), one manifest-shaped random
state_dict transplanted into BOTH implementations through
upnerf.features.convert.convert_dpt, and inverse-depth-map parity asserted.

Covers: the 'project' CLS readout, the 4-scale reassemble (1x1 proj +
x4/x2 transposed convs + stride-2 conv), the RefineNet fusion stack with
align_corners=True bilinear upsampling, the monodepth head, and the full
backbone+neck path (grid == base_grid so no pos-embed interpolation seam).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upnerf.features import vit  # noqa: E402
from upnerf.features.convert import convert_dpt  # noqa: E402
from upnerf.features.dino import _unflatten  # noqa: E402
from upnerf.features.dpt import dpt_forward, dpt_neck  # noqa: E402

DIM, DEPTH, HEADS, PATCH, GRID = 64, 4, 4, 16, 4
HOOKS = (0, 1, 2, 3)
CHANS = (32, 48, 64, 64)
FEAT = 32
H1, H2 = 16, 8  # head widths (128/32 at full size)
CFG = vit.ViTConfig(
    patch_size=PATCH, dim=DIM, depth=DEPTH, heads=HEADS, base_grid=GRID
)


def make_state_dict(seed=0):
    """Midas-named random state at small sizes (convert_dpt's manifest)."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {}
    # --- backbone (timm names under pretrained.model.) -------------------
    p = "pretrained.model."
    sd[p + "patch_embed.proj.weight"] = r(DIM, 3, PATCH, PATCH)
    sd[p + "patch_embed.proj.bias"] = r(DIM)
    sd[p + "cls_token"] = r(1, 1, DIM)
    sd[p + "pos_embed"] = r(1, 1 + GRID**2, DIM)
    sd[p + "norm.weight"] = torch.ones(DIM) + 0.1 * r(DIM)
    sd[p + "norm.bias"] = r(DIM)
    for i in range(DEPTH):
        b = f"{p}blocks.{i}."
        sd[b + "norm1.weight"] = torch.ones(DIM) + 0.1 * r(DIM)
        sd[b + "norm1.bias"] = r(DIM)
        sd[b + "attn.qkv.weight"] = r(3 * DIM, DIM)
        sd[b + "attn.qkv.bias"] = r(3 * DIM)
        sd[b + "attn.proj.weight"] = r(DIM, DIM)
        sd[b + "attn.proj.bias"] = r(DIM)
        sd[b + "norm2.weight"] = torch.ones(DIM) + 0.1 * r(DIM)
        sd[b + "norm2.bias"] = r(DIM)
        sd[b + "mlp.fc1.weight"] = r(4 * DIM, DIM)
        sd[b + "mlp.fc1.bias"] = r(4 * DIM)
        sd[b + "mlp.fc2.weight"] = r(DIM, 4 * DIM)
        sd[b + "mlp.fc2.bias"] = r(DIM)

    # --- neck (DPT act_postprocess / scratch names) ----------------------
    for k in range(4):
        ch = CHANS[k]
        pp = f"pretrained.act_postprocess{k + 1}"
        sd[pp + ".0.project.0.weight"] = r(DIM, 2 * DIM)
        sd[pp + ".0.project.0.bias"] = r(DIM)
        sd[pp + ".3.weight"] = r(ch, DIM, 1, 1)
        sd[pp + ".3.bias"] = r(ch)
        if k == 0:
            sd[pp + ".4.weight"] = r(ch, ch, 4, 4)  # ConvTranspose (in,out)
            sd[pp + ".4.bias"] = r(ch)
        elif k == 1:
            sd[pp + ".4.weight"] = r(ch, ch, 2, 2)
            sd[pp + ".4.bias"] = r(ch)
        elif k == 3:
            sd[pp + ".4.weight"] = r(ch, ch, 3, 3)  # stride-2 Conv2d
            sd[pp + ".4.bias"] = r(ch)
        sd[f"scratch.layer{k + 1}_rn.weight"] = r(FEAT, ch, 3, 3)
    for n in range(1, 5):
        rn = f"scratch.refinenet{n}"
        for unit in (1, 2):
            for c in (1, 2):
                sd[f"{rn}.resConfUnit{unit}.conv{c}.weight"] = r(FEAT, FEAT, 3, 3)
                sd[f"{rn}.resConfUnit{unit}.conv{c}.bias"] = r(FEAT)
        sd[rn + ".out_conv.weight"] = r(FEAT, FEAT, 1, 1)
        sd[rn + ".out_conv.bias"] = r(FEAT)
    sd["scratch.output_conv.0.weight"] = r(H1, FEAT, 3, 3)
    sd["scratch.output_conv.0.bias"] = r(H1)
    sd["scratch.output_conv.2.weight"] = r(H2, H1, 3, 3)
    sd["scratch.output_conv.2.bias"] = r(H2)
    sd["scratch.output_conv.4.weight"] = r(1, H2, 1, 1)
    sd["scratch.output_conv.4.bias"] = r(1)
    return sd


# --------------------------------------------------------------------------
# torch reference (published DPT-Large semantics)


def torch_vit_layers(sd, img, hooks):
    """timm ViT forward collecting post-block (pre-final-norm) tokens."""
    p = "pretrained.model."
    x = torch.from_numpy(np.asarray(img)).permute(2, 0, 1)[None]
    t = F.conv2d(
        x, sd[p + "patch_embed.proj.weight"], sd[p + "patch_embed.proj.bias"],
        stride=PATCH,
    )
    B, D, gh, gw = t.shape
    t = t.flatten(2).transpose(1, 2)
    t = torch.cat([sd[p + "cls_token"].expand(B, -1, -1), t], dim=1)
    t = t + sd[p + "pos_embed"]  # grid == base_grid: no interpolation
    layers = {}
    for i in range(DEPTH):
        b = f"{p}blocks.{i}."
        h = F.layer_norm(t, (D,), sd[b + "norm1.weight"], sd[b + "norm1.bias"], eps=1e-6)
        qkv = F.linear(h, sd[b + "attn.qkv.weight"], sd[b + "attn.qkv.bias"])
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * (D // HEADS) ** -0.5).softmax(-1)
        h = (attn @ v).transpose(1, 2).reshape(B, N, D)
        t = t + F.linear(h, sd[b + "attn.proj.weight"], sd[b + "attn.proj.bias"])
        h = F.layer_norm(t, (D,), sd[b + "norm2.weight"], sd[b + "norm2.bias"], eps=1e-6)
        h = F.gelu(F.linear(h, sd[b + "mlp.fc1.weight"], sd[b + "mlp.fc1.bias"]))
        t = t + F.linear(h, sd[b + "mlp.fc2.weight"], sd[b + "mlp.fc2.bias"])
        if i in hooks:
            layers[i] = t
    return layers, (gh, gw)


def torch_neck(sd, layers, grid):
    gh, gw = grid

    pyramid = []
    for k in range(4):
        t = layers[k]
        cls, patches = t[:, :1], t[:, 1:]
        cat = torch.cat([patches, cls.expand(-1, patches.shape[1], -1)], -1)
        pp = f"pretrained.act_postprocess{k + 1}"
        proj = F.gelu(
            F.linear(cat, sd[pp + ".0.project.0.weight"], sd[pp + ".0.project.0.bias"])
        )
        fmap = proj.transpose(1, 2).reshape(1, -1, gh, gw)
        fmap = F.conv2d(fmap, sd[pp + ".3.weight"], sd[pp + ".3.bias"])
        if k == 0:
            fmap = F.conv_transpose2d(fmap, sd[pp + ".4.weight"], sd[pp + ".4.bias"], stride=4)
        elif k == 1:
            fmap = F.conv_transpose2d(fmap, sd[pp + ".4.weight"], sd[pp + ".4.bias"], stride=2)
        elif k == 3:
            fmap = F.conv2d(fmap, sd[pp + ".4.weight"], sd[pp + ".4.bias"], stride=2, padding=1)
        fmap = F.conv2d(fmap, sd[f"scratch.layer{k + 1}_rn.weight"], None, padding=1)
        pyramid.append(fmap)

    def rcu(x, rn, unit):
        h = F.relu(x)
        h = F.conv2d(h, sd[f"{rn}.resConfUnit{unit}.conv1.weight"],
                     sd[f"{rn}.resConfUnit{unit}.conv1.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, sd[f"{rn}.resConfUnit{unit}.conv2.weight"],
                     sd[f"{rn}.resConfUnit{unit}.conv2.bias"], padding=1)
        return x + h

    def fusion(x, skip, n):
        rn = f"scratch.refinenet{n}"
        if skip is not None:
            x = x + rcu(skip, rn, 1)
        x = rcu(x, rn, 2)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return F.conv2d(x, sd[rn + ".out_conv.weight"], sd[rn + ".out_conv.bias"])

    l1, l2, l3, l4 = pyramid
    path = fusion(l4, None, 4)
    path = fusion(path, l3, 3)
    path = fusion(path, l2, 2)
    path = fusion(path, l1, 1)

    h = F.conv2d(path, sd["scratch.output_conv.0.weight"],
                 sd["scratch.output_conv.0.bias"], padding=1)
    h = F.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
    h = F.conv2d(h, sd["scratch.output_conv.2.weight"],
                 sd["scratch.output_conv.2.bias"], padding=1)
    h = F.relu(h)
    h = F.conv2d(h, sd["scratch.output_conv.4.weight"],
                 sd["scratch.output_conv.4.bias"])
    h = F.relu(h)
    return h[0, 0].detach().numpy()


# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    sd = make_state_dict()
    d = tmp_path_factory.mktemp("dpt")
    ckpt = str(d / "dpt_small.pt")
    npz = str(d / "dpt_small.npz")
    torch.save(sd, ckpt)
    convert_dpt(ckpt, npz)
    params = _unflatten({k: np.asarray(v) for k, v in np.load(npz).items()})
    return sd, params


def test_neck_matches_torch(converted):
    """Transplanted random hook tokens -> identical inverse-depth maps."""
    sd, params = converted
    rng = np.random.RandomState(3)
    layers_np = {
        k: rng.randn(1, 1 + GRID * GRID, DIM).astype(np.float32) * 0.5
        for k in HOOKS
    }
    ref = torch_neck(
        sd, {k: torch.from_numpy(v) for k, v in layers_np.items()}, (GRID, GRID)
    )
    out = np.asarray(
        dpt_neck(
            params, {k: jnp.asarray(v) for k, v in layers_np.items()},
            (GRID, GRID), hooks=HOOKS,
        )
    )
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(out / scale, ref / scale, rtol=1e-4, atol=1e-4)


def test_full_dpt_matches_torch(converted):
    """Backbone + neck end-to-end on a random image (the exact path
    save_dpt_depth.py runs, minus the PIL resizes)."""
    sd, params = converted
    img = np.random.RandomState(7).rand(PATCH * GRID, PATCH * GRID, 3)
    img = ((img - 0.5) / 0.5).astype(np.float32)  # midas normalization

    layers, grid = torch_vit_layers(sd, img, HOOKS)
    ref = torch_neck(sd, layers, grid)
    out = np.asarray(dpt_forward(params, jnp.asarray(img), CFG, hooks=HOOKS))
    assert out.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-3)
    np.testing.assert_allclose(out / scale, ref / scale, rtol=1e-4, atol=2e-4)
