"""DPT-Large monocular inverse-depth estimation in JAX.

Replicates the reference's offline DPT step (preprocess/save_dpt_depth.py:
21-179): 384x384 input, ViT-L/16 backbone with hooks at blocks
[5, 11, 17, 23], 'project' readout, reassemble to a 4-scale pyramid
(channels 256/512/1024/1024), RefineNet-style fusion at 256 features, and
the monodepth head with non-negative output. The predicted inverse-depth
map is bicubic-resized back to the source image size
(preprocess/save_dpt_depth.py:150-170) and saved as .npy.

Weights load from an npz converted from the public dpt_large-midas
checkpoint (upnerf.features.convert.convert_dpt).

Parameter layout:
  backbone/...          : ViT-L params (vit.py layout, base_grid 24)
  readout{k}/{w,b}      : (2D, D) project readout per hook k in 0..3
  reassemble{k}/proj/{w,b}   : 1x1 conv (D -> ch_k)
  reassemble{k}/resample/{w,b}: transposed/strided conv per scale
  layer_rn{k}/w         : 3x3 conv (ch_k -> 256), no bias
  refine{k}/rcu{1,2}/conv{1,2}/{w,b} : residual conv units
  refine{k}/out/{w,b}   : 1x1 out conv
  head/conv1/{w,b} (3x3, 256->128), head/conv2/{w,b} (3x3, 128->32),
  head/conv3/{w,b} (1x1, 32->1)
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import vit

DPT_HOOKS = (5, 11, 17, 23)
DPT_CHANNELS = (256, 512, 1024, 1024)
DPT_VIT = vit.ViTConfig(patch_size=16, dim=1024, depth=24, heads=16, base_grid=24)
MIDAS_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
MIDAS_STD = np.array([0.5, 0.5, 0.5], np.float32)


def conv2d(x, w, b=None, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def conv2d_transpose(x, w, b=None, stride=2):
    y = jax.lax.conv_transpose(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y if b is None else y + b


def _interp_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """1-D linear-interpolation matrix with ALIGN_CORNERS=TRUE semantics
    (src = i * (n_in - 1) / (n_out - 1)) — what DPT's F.interpolate uses
    throughout (FeatureFusionBlock_custom / Interpolate,
    preprocess/save_dpt_depth.py pipeline). jax.image.resize implements
    half-pixel centers (align_corners=False), which shifts every fused map
    by up to half an input pixel; the dense matrix form is exact AND lowers
    to one MXU matmul per axis (shapes are static, the matrix constant-
    folds)."""
    if n_in == 1:
        return jnp.ones((n_out, 1))
    src = jnp.arange(n_out) * ((n_in - 1) / (n_out - 1))
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
    w1 = src - i0
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in))
    m = m.at[rows, i0].add(1.0 - w1)
    m = m.at[rows, i0 + 1].add(w1)
    return m


def _upsample2(x):
    n, h, w, c = x.shape
    my = _interp_matrix(h, 2 * h)
    mx = _interp_matrix(w, 2 * w)
    x = jnp.einsum("oh,nhwc->nowc", my, x)
    return jnp.einsum("pw,nowc->nopc", mx, x)


def _residual_conv_unit(x, p):
    h = jax.nn.relu(x)
    h = conv2d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.relu(h)
    h = conv2d(h, p["conv2"]["w"], p["conv2"]["b"])
    return x + h


def _fusion(x, skip, p):
    """FeatureFusionBlock: optional skip add through RCU1, RCU2, x2
    upsample, 1x1 out conv."""
    if skip is not None:
        x = x + _residual_conv_unit(skip, p["rcu1"])
    x = _residual_conv_unit(x, p["rcu2"])
    x = _upsample2(x)
    return conv2d(x, p["out"]["w"], p["out"]["b"])


def dpt_forward(
    params: Dict,
    img: jnp.ndarray,
    cfg: vit.ViTConfig = DPT_VIT,
    hooks=DPT_HOOKS,
) -> jnp.ndarray:
    """(H384, W384, 3) normalized -> (H384, W384) inverse depth."""
    bb = vit.forward_features(
        params["backbone"], cfg, img, stride=cfg.patch_size,
        out_layers=hooks,
    )
    return dpt_neck(params, bb["layers"], bb["grid"], hooks)


def dpt_neck(
    params: Dict,
    layers: Dict[int, jnp.ndarray],
    grid,
    hooks=DPT_HOOKS,
) -> jnp.ndarray:
    """Readout-project + reassemble + RefineNet fusion + monodepth head
    (everything after the ViT backbone; preprocess/save_dpt_depth.py DPT
    pipeline). Split out so the torch-twin parity test can drive it on
    transplanted hook tokens (tests/test_dpt_torch_twin.py)."""
    gh, gw = grid

    pyramid = []
    for k, hook in enumerate(hooks):
        tokens = layers[hook]  # (1, 1+N, D)
        cls = tokens[:, :1]
        patches = tokens[:, 1:]
        # 'project' readout: concat CLS to every token, linear + GELU
        cat = jnp.concatenate(
            [patches, jnp.broadcast_to(cls, patches.shape)], -1
        )
        proj = jax.nn.gelu(
            cat @ params[f"readout{k}"]["w"] + params[f"readout{k}"]["b"],
            approximate=False,
        )
        fmap = proj.reshape(1, gh, gw, -1)
        p = params[f"reassemble{k}"]
        fmap = conv2d(fmap, p["proj"]["w"], p["proj"]["b"])  # 1x1 to ch_k
        if k == 0:  # 1/4 scale: x4 transposed conv
            fmap = conv2d_transpose(fmap, p["resample"]["w"], p["resample"]["b"], 4)
        elif k == 1:  # 1/8: x2 transposed conv
            fmap = conv2d_transpose(fmap, p["resample"]["w"], p["resample"]["b"], 2)
        elif k == 3:  # 1/32: stride-2 conv. Explicit symmetric (1,1) pads:
            # torch Conv2d(3x3, stride=2, padding=1) pads BOTH sides, while
            # XLA "SAME" at stride 2 on an even input pads only the high
            # side — the windows land one pixel apart (caught by the
            # torch-twin test).
            fmap = conv2d(
                fmap, p["resample"]["w"], p["resample"]["b"], stride=2,
                padding=((1, 1), (1, 1)),
            )
        fmap = conv2d(fmap, params[f"layer_rn{k}"]["w"], None)  # 3x3 -> 256
        pyramid.append(fmap)

    l1, l2, l3, l4 = pyramid
    # deepest refinenet takes no lateral skip
    path = _fusion(l4, None, params["refine3"])
    path = _fusion(path, l3, params["refine2"])
    path = _fusion(path, l2, params["refine1"])
    path = _fusion(path, l1, params["refine0"])  # -> 1/2 scale

    h = conv2d(path, params["head"]["conv1"]["w"], params["head"]["conv1"]["b"])
    h = _upsample2(h)  # -> full res
    h = conv2d(h, params["head"]["conv2"]["w"], params["head"]["conv2"]["b"])
    h = jax.nn.relu(h)
    h = conv2d(h, params["head"]["conv3"]["w"], params["head"]["conv3"]["b"])
    h = jax.nn.relu(h)  # non_negative inverse depth
    return h[0, :, :, 0]


class DPTDepth:
    def __init__(self, params: Dict, net_size: int = 384):
        self.net_size = net_size
        # device-resident params passed as a jit argument — closure capture
        # would bake ~340 MB of ViT-L weights into the graph as constants
        # (see DinoExtractor).
        self.params = jax.tree.map(jnp.asarray, params)
        self._jit = jax.jit(dpt_forward)

    def __call__(self, image_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 -> (H, W) float32 inverse depth (resized back,
        preprocess/save_dpt_depth.py:150-170)."""
        from PIL import Image

        h, w = image_u8.shape[:2]
        img = Image.fromarray(image_u8).resize(
            (self.net_size, self.net_size), Image.BICUBIC
        )
        x = np.asarray(img, np.float32) / 255.0
        x = (x - MIDAS_MEAN) / MIDAS_STD
        pred = np.asarray(self._jit(self.params, jnp.asarray(x)))
        out = Image.fromarray(pred, mode="F").resize((w, h), Image.BICUBIC)
        return np.asarray(out, np.float32)


def load_dpt(weights_path: Optional[str] = None) -> Optional[DPTDepth]:
    weights_path = weights_path or os.environ.get("UPNERF_DPT_WEIGHTS")
    if weights_path is None or not os.path.isfile(weights_path):
        return None
    from .dino import _unflatten

    return DPTDepth(_unflatten(dict(np.load(weights_path))))


def save_depths(model: DPTDepth, image_paths, save_dir: str, log=print) -> None:
    """Write <save_dir>/*.npy inverse-depth maps
    (preprocess/save_dpt_depth.py:174-177 layout)."""
    from PIL import Image

    from upnerf.data.images import npy_name

    os.makedirs(save_dir, exist_ok=True)
    for i, path in enumerate(image_paths):
        img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        inv_depth = model(img)
        stem = npy_name(path)[:-4]
        np.save(os.path.join(save_dir, stem + ".npy"), inv_depth)
        log(f"[dpt] {i + 1}/{len(image_paths)} {stem}")


def init_dpt_params(key: jax.Array, small: bool = False) -> Dict:
    """Random init for tests (small=True shrinks the backbone)."""
    cfg = (
        vit.ViTConfig(patch_size=16, dim=64, depth=4, heads=4, base_grid=24)
        if small
        else DPT_VIT
    )
    hooks = (0, 1, 2, 3) if small else DPT_HOOKS
    chans = (32, 48, 64, 64) if small else DPT_CHANNELS
    feat = 32 if small else 256
    ks = iter(jax.random.split(key, 128))

    def conv(k, kh, kw, i, o, bias=True):
        p = {"w": jax.random.normal(k, (kh, kw, i, o)) * 0.02}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    d = cfg.dim
    params: Dict = {"backbone": vit.init_vit_params(next(ks), cfg)}
    for k in range(4):
        params[f"readout{k}"] = {
            "w": jax.random.normal(next(ks), (2 * d, d)) * 0.02,
            "b": jnp.zeros((d,)),
        }
        ch = chans[k]
        re = {"proj": conv(next(ks), 1, 1, d, ch)}
        if k == 0:
            re["resample"] = conv(next(ks), 4, 4, ch, ch)
        elif k == 1:
            re["resample"] = conv(next(ks), 2, 2, ch, ch)
        elif k == 3:
            re["resample"] = conv(next(ks), 3, 3, ch, ch)
        params[f"reassemble{k}"] = re
        params[f"layer_rn{k}"] = {"w": jax.random.normal(next(ks), (3, 3, ch, feat)) * 0.02}
    for k in range(4):
        params[f"refine{k}"] = {
            "rcu1": {
                "conv1": conv(next(ks), 3, 3, feat, feat),
                "conv2": conv(next(ks), 3, 3, feat, feat),
            },
            "rcu2": {
                "conv1": conv(next(ks), 3, 3, feat, feat),
                "conv2": conv(next(ks), 3, 3, feat, feat),
            },
            "out": conv(next(ks), 1, 1, feat, feat),
        }
    params["head"] = {
        "conv1": conv(next(ks), 3, 3, feat, feat // 2),
        "conv2": conv(next(ks), 3, 3, feat // 2, 32),
        "conv3": conv(next(ks), 1, 1, 32, 1),
    }
    return (params, cfg, hooks) if small else params
