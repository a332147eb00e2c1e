"""Converter hardening without network egress (VERDICT r1, next-round #4).

The public checkpoints cannot be downloaded here, but their state-dict
LAYOUTS are fixed by the public model definitions. These tests embed the
key->shape manifests, build manifest-shaped random torch checkpoints, run
the repo's converters on them, and assert the JAX models consume every key
with correct shapes/transposes (a forward pass through the converted
weights, plus a consumed-every-key audit on the state dict).

Manifest sources (layouts, not values):
- DINO ViT-S/8 `dino_deitsmall8_pretrain.pth`: facebookresearch/dino
  vision_transformer.py (embed 384, depth 12, heads 6, mlp 1536, patch 8,
  img 224 -> pos_embed 1+28^2 tokens). Consumed by
  upnerf/features/convert.py:_vit_from_timm_state.
- DPT-Large `dpt_large-midas-2f21e586.pt`: isl-org/DPT dpt/vit.py +
  dpt/blocks.py (ViT-L/16 backbone under `pretrained.model.`, readout
  projections act_postprocess1..4, scratch refinenets + output head).
  Consumed by upnerf/features/convert.py:convert_dpt
  (cf. /root/reference/preprocess/save_dpt_depth.py:21-52).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from upnerf.features import convert, dino, dpt, vit


class RecordingDict(dict):
    """State dict that records which keys the converter consumed."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _vit_manifest(embed, depth, mlp, patch, n_tokens, prefix=""):
    m = {
        f"{prefix}cls_token": (1, 1, embed),
        f"{prefix}pos_embed": (1, n_tokens, embed),
        f"{prefix}patch_embed.proj.weight": (embed, 3, patch, patch),
        f"{prefix}patch_embed.proj.bias": (embed,),
        f"{prefix}norm.weight": (embed,),
        f"{prefix}norm.bias": (embed,),
    }
    for i in range(depth):
        b = f"{prefix}blocks.{i}."
        m.update({
            b + "norm1.weight": (embed,), b + "norm1.bias": (embed,),
            b + "attn.qkv.weight": (3 * embed, embed),
            b + "attn.qkv.bias": (3 * embed,),
            b + "attn.proj.weight": (embed, embed),
            b + "attn.proj.bias": (embed,),
            b + "norm2.weight": (embed,), b + "norm2.bias": (embed,),
            b + "mlp.fc1.weight": (mlp, embed), b + "mlp.fc1.bias": (mlp,),
            b + "mlp.fc2.weight": (embed, mlp), b + "mlp.fc2.bias": (embed,),
        })
    return m


def dino_vits8_manifest():
    # ViT-S/8: embed 384, depth 12, mlp 1536, patch 8, 224/8=28 -> 785 tokens
    return _vit_manifest(384, 12, 1536, 8, 28 * 28 + 1)


def dpt_large_manifest():
    # backbone vit_large_patch16_384: embed 1024, depth 24, mlp 4096,
    # patch 16, 384/16=24 -> 577 tokens
    m = _vit_manifest(1024, 24, 4096, 16, 24 * 24 + 1,
                      prefix="pretrained.model.")
    chans = [256, 512, 1024, 1024]
    for k in range(4):
        pp = f"pretrained.act_postprocess{k + 1}"
        m[pp + ".0.project.0.weight"] = (1024, 2048)
        m[pp + ".0.project.0.bias"] = (1024,)
        m[pp + ".3.weight"] = (chans[k], 1024, 1, 1)
        m[pp + ".3.bias"] = (chans[k],)
        if k == 0:  # ConvTranspose2d(256, 256, 4, 4): (in, out, kh, kw)
            m[pp + ".4.weight"] = (256, 256, 4, 4)
            m[pp + ".4.bias"] = (256,)
        elif k == 1:
            m[pp + ".4.weight"] = (512, 512, 2, 2)
            m[pp + ".4.bias"] = (512,)
        elif k == 3:  # Conv2d(1024, 1024, 3, stride=2, padding=1)
            m[pp + ".4.weight"] = (1024, 1024, 3, 3)
            m[pp + ".4.bias"] = (1024,)
        m[f"scratch.layer{k + 1}_rn.weight"] = (256, chans[k], 3, 3)
    for r in range(1, 5):
        rn = f"scratch.refinenet{r}"
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv in ("conv1", "conv2"):
                m[f"{rn}.{unit}.{conv}.weight"] = (256, 256, 3, 3)
                m[f"{rn}.{unit}.{conv}.bias"] = (256,)
        m[f"{rn}.out_conv.weight"] = (256, 256, 1, 1)
        m[f"{rn}.out_conv.bias"] = (256,)
    m["scratch.output_conv.0.weight"] = (128, 256, 3, 3)
    m["scratch.output_conv.0.bias"] = (128,)
    m["scratch.output_conv.2.weight"] = (32, 128, 3, 3)
    m["scratch.output_conv.2.bias"] = (32,)
    m["scratch.output_conv.4.weight"] = (1, 32, 1, 1)
    m["scratch.output_conv.4.bias"] = (1,)
    return m


def _random_state_dict(manifest, seed=0):
    g = torch.Generator().manual_seed(seed)
    return RecordingDict(
        (k, torch.randn(*shape, generator=g) * 0.02)
        for k, shape in manifest.items()
    )


class TestDinoConverter:
    def test_roundtrip_and_forward(self, tmp_path):
        manifest = dino_vits8_manifest()
        sd = _random_state_dict(manifest)
        ckpt = tmp_path / "dino_vits8.pth"
        torch.save(dict(sd), ckpt)
        out = tmp_path / "dino.npz"
        convert.convert_dino_vit(str(ckpt), str(out))

        flat = dict(np.load(out))
        params = dino._unflatten(flat)
        # every manifest key shaped a converted array
        # (the converter reloads via torch.load, so audit by re-running on
        # the recording dict directly)
        sd2 = _random_state_dict(manifest)
        convert._vit_from_timm_state(sd2)
        assert sd2.consumed == set(manifest), (
            set(manifest) - sd2.consumed
        )

        # the JAX ViT consumes the converted tree end-to-end: small input,
        # stride-4 key-facet extraction (the production configuration)
        ext = dino.DinoExtractor(params, load_size=32)
        img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
        feat = ext(img)
        gh = (32 - 8) // 4 + 1
        assert feat.shape == (gh, gh, 384)
        assert np.isfinite(feat).all()

    def test_teacher_wrapped_checkpoint(self, tmp_path):
        """The full DINO checkpoint nests the backbone under
        teacher/backbone.* (convert.py:60-61)."""
        manifest = dino_vits8_manifest()
        sd = {f"backbone.{k}": v for k, v in _random_state_dict(manifest).items()}
        sd["head.mlp.0.weight"] = torch.zeros(2048, 384)  # ignored
        ckpt = tmp_path / "full.pth"
        torch.save({"teacher": dict(sd), "student": {}}, ckpt)
        out = tmp_path / "dino.npz"
        convert.convert_dino_vit(str(ckpt), str(out))
        params = dino._unflatten(dict(np.load(out)))
        assert params["pos_embed"].shape == (1, 785, 384)
        assert len([k for k in params if k.startswith("blk")]) == 12


class TestDPTConverter:
    def test_roundtrip_and_forward(self, tmp_path):
        manifest = dpt_large_manifest()
        sd = _random_state_dict(manifest)
        ckpt = tmp_path / "dpt_large.pt"
        torch.save(dict(sd), ckpt)
        out = tmp_path / "dpt.npz"
        convert.convert_dpt(str(ckpt), str(out))

        params = dino._unflatten(dict(np.load(out)))
        # shape audit of the converted tree against the JAX model's layout
        assert params["backbone"]["pos_embed"].shape == (1, 577, 1024)
        assert params["backbone"]["patch_embed"]["w"].shape == (16, 16, 3, 1024)
        assert params["readout0"]["w"].shape == (2048, 1024)
        assert params["reassemble0"]["resample"]["w"].shape == (4, 4, 256, 256)
        assert params["layer_rn3"]["w"].shape == (3, 3, 1024, 256)
        assert params["head"]["conv3"]["w"].shape == (1, 1, 32, 1)

        # a 96x96 forward through the full converted ViT-L + fusion head
        # (pos-embed interpolation makes small inputs legal)
        import jax.numpy as jnp

        x = jnp.asarray(
            np.random.RandomState(0).rand(96, 96, 3).astype(np.float32)
        )
        inv_depth = dpt.dpt_forward(params, x)
        assert inv_depth.shape == (96, 96)
        assert np.isfinite(np.asarray(inv_depth)).all()

    def test_consumes_every_checkpoint_key(self, tmp_path):
        manifest = dpt_large_manifest()
        sd = _random_state_dict(manifest)
        ckpt = tmp_path / "dpt_large.pt"
        torch.save(dict(sd), ckpt)
        # patch torch.load to return a recording dict so we can audit
        real_load = torch.load

        rec = {}

        def load_recording(*a, **k):
            d = RecordingDict(real_load(*a, **k))
            rec["sd"] = d
            return d

        torch.load = load_recording
        try:
            convert.convert_dpt(str(ckpt), str(tmp_path / "dpt.npz"))
        finally:
            torch.load = real_load
        assert rec["sd"].consumed == set(manifest), sorted(
            set(manifest) - rec["sd"].consumed
        )[:10]


class TestLPIPSManifest:
    def test_manifest_shaped_npz_loads_and_runs(self, tmp_path):
        """lpips-pip AlexNet layout: 5 feature convs + 5 learned 1x1 lins
        (channels 64/192/384/256/256) — the converter output contract
        (upnerf/evaluate/lpips.py:100-123)."""
        from upnerf.evaluate import lpips as lp

        chans = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                 (256, 384, 3, 3), (256, 256, 3, 3)]
        rng = np.random.RandomState(0)
        flat = {}
        for i, c in enumerate(chans):
            flat[f"conv{i}_w"] = rng.randn(*c).astype(np.float32) * 0.02
            flat[f"conv{i}_b"] = rng.randn(c[0]).astype(np.float32) * 0.02
        for i, c in enumerate([64, 192, 384, 256, 256]):
            flat[f"lin{i}"] = np.abs(rng.randn(c)).astype(np.float32)
        path = tmp_path / "lpips.npz"
        np.savez(path, **flat)
        model = lp.load_lpips(str(path))
        assert model is not None
        a = rng.rand(40, 48, 3).astype(np.float32)
        b = rng.rand(40, 48, 3).astype(np.float32)
        d = model(a, b)
        assert np.isfinite(d) and d >= 0
