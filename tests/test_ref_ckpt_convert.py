"""Trained-checkpoint migration: reference Lightning ckpt -> our params.

Drives upnerf/utils/ref_ckpt.py against the ACTUAL reference modules
(randomly initialized): builds a NeRFSystem-style state_dict with the
reference's own attribute naming, converts it, and asserts forward parity
of the converted parameters — the direction a migrating user needs.
Skipped when /root/reference or torch is unavailable (same gating as
tests/test_reference_parity.py).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if not os.path.isdir(REFERENCE):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from upnerf.models import (  # noqa: E402
    NeRFConfig, TransientConfig, apply_nerf, apply_transient,
)
from upnerf.utils import ref_ckpt  # noqa: E402

CFG = NeRFConfig(
    D=4, W=32, skips=(2,), feat_dim=16, xyz_L=4, dir_L=2,
    appearance_dim=8, candidate_dim=4, c2f=(0.1, 0.5),
)
TCFG = TransientConfig(beta_min=0.1, transient_dim=12, feat_dim=16)
N_IMAGES = 5


def build_ref_system_state_dict(seed=0):
    """Random reference modules assembled under the NeRFSystem attribute
    names (models/nerf_system.py:340-409)."""
    from models.nerf import NeRF as RefNeRF
    from models.transient_net import TransientNet as RefT

    torch.manual_seed(seed)
    mods = {}
    for typ in ("coarse", "fine"):
        mods[f"nerf_{typ}"] = RefNeRF(
            typ, D=CFG.D, W=CFG.W, skips=list(CFG.skips),
            encode_feat=True, feat_dim=CFG.feat_dim,
            xyz_L=CFG.xyz_L, dir_L=CFG.dir_L,
            appearance_dim=CFG.appearance_dim,
            candidate_dim=CFG.candidate_dim, c2f=list(CFG.c2f),
        )
    mods["transient_net"] = RefT(
        N_images=N_IMAGES, beta_min=TCFG.beta_min,
        trasient_dim=TCFG.transient_dim, feat_dim=TCFG.feat_dim,
    )
    for name in ("embedding_coarse_a", "embedding_fine_a"):
        mods[name] = torch.nn.Embedding(N_IMAGES, CFG.appearance_dim)
    for name in ("embedding_coarse_c", "embedding_fine_c"):
        mods[name] = torch.nn.Embedding(N_IMAGES, CFG.candidate_dim)
    mods["se3_refine"] = torch.nn.Embedding(N_IMAGES, 6)
    mods["depth_scale"] = torch.nn.Embedding(N_IMAGES, 2)
    with torch.no_grad():
        mods["se3_refine"].weight.mul_(0.01)

    sd = {}
    for attr, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"{attr}.{k}"] = v
    return sd, mods


class TestConvertParity:
    def test_nerf_forward_parity(self):
        sd, mods = build_ref_system_state_dict()
        params, pose_params, meta = ref_ckpt.convert_state_dict(sd)
        assert meta["n_images"] == N_IMAGES

        B = 16
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        inputs = {
            "input_xyz": jax.random.normal(ks[0], (B, 3)),
            "input_dir": jax.random.normal(ks[1], (B, 3)),
            "input_a": jax.random.normal(ks[2], (B, CFG.appearance_dim)),
            "input_c": jax.random.normal(ks[3], (B, CFG.candidate_dim)),
        }
        for typ, phase, sched in (("coarse", 1, 0.4), ("fine", 2, 1.0)):
            out = apply_nerf(
                params[f"nerf_{typ}"], CFG, inputs, phase=phase,
                sched_mult=jnp.array(sched), progress=jnp.array(0.0),
                precision="float32",
            )
            with torch.no_grad():
                ref_out = mods[f"nerf_{typ}"](
                    {k: torch.from_numpy(np.asarray(v)) for k, v in inputs.items()},
                    sched_mult=sched,
                )
            for k in ref_out:
                theirs = ref_out[k].numpy()
                if "sigma" in k:
                    theirs = theirs[:, 0]
                np.testing.assert_allclose(
                    np.asarray(out[k]), theirs, atol=2e-5, err_msg=(typ, k)
                )

    def test_transient_forward_parity(self):
        sd, mods = build_ref_system_state_dict(seed=3)
        params, _, _ = ref_ckpt.convert_state_dict(sd)
        B = 8
        feat = jax.random.normal(jax.random.PRNGKey(2), (B, TCFG.feat_dim))
        ts = jnp.arange(B) % N_IMAGES
        out = apply_transient(params["transient"], TCFG, feat, ts)
        with torch.no_grad():
            ref_out = mods["transient_net"](
                torch.from_numpy(np.asarray(feat)),
                torch.from_numpy(np.asarray(ts)),
            )
        for k in ("alpha", "rgb", "beta"):
            np.testing.assert_allclose(
                np.asarray(out[k]).reshape(-1),
                ref_out[k].numpy().reshape(-1),
                atol=2e-5, err_msg=k,
            )

    def test_embeddings_and_pose_tables(self):
        sd, mods = build_ref_system_state_dict(seed=5)
        params, pose_params, _ = ref_ckpt.convert_state_dict(sd)
        np.testing.assert_array_equal(
            params["embeddings"]["fine_a"],
            mods["embedding_fine_a"].weight.detach().numpy(),
        )
        np.testing.assert_array_equal(
            pose_params["se3"], mods["se3_refine"].weight.detach().numpy()
        )
        np.testing.assert_array_equal(
            pose_params["depth_scale"],
            mods["depth_scale"].weight.detach().numpy(),
        )


class TestEndToEndMigration:
    def test_lightning_ckpt_to_run_dir(self, tmp_path):
        """torch.save a Lightning-shaped .ckpt, convert via the CLI entry
        function, and restore it through the same load path tto/eval use."""
        from upnerf.config import default as default_config
        from upnerf.train.state import build_train_state
        from upnerf.utils.ckpt import CheckpointManager

        sd, _ = build_ref_system_state_dict(seed=7)
        hp = default_config()
        hp.update({
            "nerf.D": CFG.D, "nerf.W": CFG.W, "nerf.skips": [2],
            "nerf.N_emb_xyz": CFG.xyz_L, "nerf.N_emb_dir": CFG.dir_L,
            "nerf.appearance_dim": CFG.appearance_dim,
            "nerf.candidate_dim": CFG.candidate_dim,
            "nerf.feat_dim": CFG.feat_dim,
            "pose.c2f": list(CFG.c2f),
            "t_net.transient_dim": TCFG.transient_dim,
            "t_net.feat_dim": TCFG.feat_dim,
            "tpu.fused_trunk": False,
        })
        ckpt_path = tmp_path / "epoch=3.ckpt"
        torch.save(
            {"state_dict": sd, "hyper_parameters": hp, "global_step": 1234},
            ckpt_path,
        )
        run_dir = tmp_path / "run"
        ref_ckpt.convert_reference_run(
            str(ckpt_path), str(run_dir), log=lambda *a: None
        )

        assert (run_dir / "config.yaml").exists()
        from upnerf.config import get_from_path

        hp2 = get_from_path(str(run_dir / "config.yaml"))
        state_like = build_train_state(hp2, N_IMAGES)
        mngr = CheckpointManager(str(run_dir / "ckpts"))
        step = mngr.latest_step()
        # Lightning global_step counts BOTH optimizer steps under pose
        # optimization (train.py:59-62); our step counts batches.
        assert step == 1234 // 2
        state = mngr.restore(state_like, step)
        mngr.close()
        np.testing.assert_array_equal(
            np.asarray(state.pose_params["se3"]),
            np.asarray(sd["se3_refine.weight"]),
        )
        got = np.asarray(state.params["nerf_fine"]["trunk"][0]["w"])
        want = np.asarray(sd["nerf_fine.xyz_encoding_1.0.weight"]).T
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cli_entry(self, tmp_path, capsys):
        """Same migration through the console entry's arg parsing."""
        from upnerf.cli.convert_weights import main as convert_main
        from upnerf.config import default as default_config

        sd, _ = build_ref_system_state_dict(seed=11)
        hp = default_config()
        hp.update({
            "nerf.D": CFG.D, "nerf.W": CFG.W, "nerf.skips": [2],
            "nerf.N_emb_xyz": CFG.xyz_L, "nerf.N_emb_dir": CFG.dir_L,
            "nerf.appearance_dim": CFG.appearance_dim,
            "nerf.candidate_dim": CFG.candidate_dim,
            "nerf.feat_dim": CFG.feat_dim,
            "pose.c2f": list(CFG.c2f),
            "t_net.transient_dim": TCFG.transient_dim,
            "t_net.feat_dim": TCFG.feat_dim,
            "tpu.fused_trunk": False,
        })
        ckpt_path = tmp_path / "last.ckpt"
        torch.save(
            {"state_dict": sd, "hyper_parameters": hp, "global_step": 77},
            ckpt_path,
        )
        run_dir = tmp_path / "cli_run"
        convert_main(["model", str(ckpt_path), str(run_dir)])
        assert "step-38" in capsys.readouterr().out  # 77 // 2 batches
        assert (run_dir / "config.yaml").exists()
        assert os.path.isdir(run_dir / "ckpts")

    def test_image_count_mismatch_raises(self, tmp_path):
        """Tables sized for a different scene fail at CONVERT time with a
        readable message (not a deep orbax shape error inside tto)."""
        from upnerf.config import default as default_config
        from upnerf.data import synthetic

        scene = tmp_path / "scene"
        synthetic.generate_scene(
            str(scene), n_train=3, n_test=1, H=16, W=16, feat_hw=4,
            feat_dim=CFG.feat_dim, focal=16.0,
        )
        sd, _ = build_ref_system_state_dict(seed=13)  # N_IMAGES=5 != 3
        hp = default_config()
        hp.update({
            "dataset_name": "custom", "root_dir": str(scene),
            "nerf.D": CFG.D, "nerf.W": CFG.W, "nerf.skips": [2],
            "nerf.N_emb_xyz": CFG.xyz_L, "nerf.N_emb_dir": CFG.dir_L,
            "nerf.appearance_dim": CFG.appearance_dim,
            "nerf.candidate_dim": CFG.candidate_dim,
            "nerf.feat_dim": CFG.feat_dim,
            "pose.c2f": list(CFG.c2f),
            "t_net.transient_dim": TCFG.transient_dim,
            "t_net.feat_dim": TCFG.feat_dim,
            "tpu.fused_trunk": False,
        })
        ckpt_path = tmp_path / "wrong_scene.ckpt"
        torch.save(
            {"state_dict": sd, "hyper_parameters": hp, "global_step": 5},
            ckpt_path,
        )
        with pytest.raises(SystemExit, match="5 images.*3 train"):
            ref_ckpt.convert_reference_run(
                str(ckpt_path), str(tmp_path / "runX"), log=lambda *a: None
            )

    def test_structure_mismatch_raises(self, tmp_path):
        from upnerf.config import default as default_config

        sd, _ = build_ref_system_state_dict(seed=9)
        hp = default_config()  # flagship dims != tiny modules
        hp["tpu.fused_trunk"] = False
        ckpt_path = tmp_path / "bad.ckpt"
        torch.save(
            {"state_dict": sd, "hyper_parameters": hp, "global_step": 5},
            ckpt_path,
        )
        with pytest.raises(AssertionError, match="param tree"):
            ref_ckpt.convert_reference_run(
                str(ckpt_path), str(tmp_path / "run2"), log=lambda *a: None
            )


class TestReverseExport:
    def test_round_trip_state_dict(self):
        """reference sd -> our params -> exported sd == original, tensor
        for tensor (the exporter is the exact inverse of the converter)."""
        sd, _ = build_ref_system_state_dict(seed=13)
        params, pose_params, meta = ref_ckpt.convert_state_dict(sd)
        out = ref_ckpt.export_state_dict(params, pose_params, progress=0.0)
        assert set(out) == set(sd), (
            set(sd) - set(out), set(out) - set(sd),
        )
        for k in sd:
            np.testing.assert_allclose(
                out[k].numpy(), sd[k].detach().numpy(), rtol=1e-6,
                err_msg=k,
            )

    def test_exported_sd_strict_loads_into_reference_modules(self):
        """The exported names/shapes satisfy the ACTUAL reference modules'
        strict load_state_dict — the contract a migrating-back user needs."""
        sd, mods = build_ref_system_state_dict(seed=17)
        params, pose_params, _ = ref_ckpt.convert_state_dict(sd)
        out = ref_ckpt.export_state_dict(params, pose_params, progress=0.37)
        for attr, mod in mods.items():
            sub = {
                k[len(attr) + 1:]: v
                for k, v in out.items()
                if k.startswith(attr + ".")
            }
            mod.load_state_dict(sub, strict=True)
        assert float(mods["nerf_coarse"].progress.detach()) == pytest.approx(
            0.37
        )

    def test_export_framework_run_cli(self, tmp_path, capsys):
        """Full circle through both CLIs: lightning ckpt -> run dir ->
        `convert_weights export` -> lightning ckpt, equal state_dict."""
        from upnerf.cli.convert_weights import main as convert_main
        from upnerf.config import default as default_config

        sd, _ = build_ref_system_state_dict(seed=19)
        hp = default_config()
        hp.update({
            "nerf.D": CFG.D, "nerf.W": CFG.W, "nerf.skips": [2],
            "nerf.N_emb_xyz": CFG.xyz_L, "nerf.N_emb_dir": CFG.dir_L,
            "nerf.appearance_dim": CFG.appearance_dim,
            "nerf.candidate_dim": CFG.candidate_dim,
            "nerf.feat_dim": CFG.feat_dim,
            "pose.c2f": list(CFG.c2f),
            "t_net.transient_dim": TCFG.transient_dim,
            "t_net.feat_dim": TCFG.feat_dim,
            "tpu.fused_trunk": False,
            "max_steps": 1000,
            "pose.optimize": True,
        })
        ckpt_in = tmp_path / "ref.ckpt"
        torch.save(
            {"state_dict": sd, "hyper_parameters": hp, "global_step": 500},
            ckpt_in,
        )
        run_dir = tmp_path / "run"
        convert_main(["model", str(ckpt_in), str(run_dir)])
        ckpt_out = tmp_path / "exported.ckpt"
        convert_main(["export", str(run_dir), str(ckpt_out)])
        assert "exported step-250" in capsys.readouterr().out

        back = torch.load(ckpt_out, map_location="cpu", weights_only=False)
        # round-trip: global_step 500 -> our step 250 (batches) -> 500
        assert back["global_step"] == 500
        for k in sd:
            if k.endswith(".progress"):
                # 250 / max_steps 1000
                assert float(back["state_dict"][k]) == pytest.approx(0.25)
                continue
            np.testing.assert_allclose(
                back["state_dict"][k].numpy(), sd[k].detach().numpy(),
                rtol=1e-6, err_msg=k,
            )
        assert back["hyper_parameters"]["nerf.W"] == CFG.W
