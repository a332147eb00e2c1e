"""Tests for the end-to-end quality protocol (train -> tto -> eval).

The artifact-resilience contract (incremental partial writes, reuse of
completed seeds from the committed artifact after a scratch wipe) is
unit-tested on synthetic rows; the full pipeline glue is driven e2e on a
tiny CPU-scale scene by monkeypatching the protocol's module constants —
the identical code path the TPU invocation takes.
"""

import importlib.util
import json
import os

_SPEC = importlib.util.spec_from_file_location(
    "quality_protocol",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "quality_protocol.py"),
)
quality_protocol = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(quality_protocol)


def _row(seed, steps=4000, psnr=23.0):
    return {
        "seed": seed, "exp": f"quality_seed{seed}", "steps": steps,
        "final_val_psnr": psnr, "tto_psnr_mean": psnr + 1.0,
        "tto_ssim_mean": 0.8, "n_test_images": 2,
    }


def test_write_summary_partial_then_complete(tmp_path):
    out = str(tmp_path / "quality.json")
    s1 = quality_protocol.write_summary(
        out, 4000, [42, 777], [_row(42)], "abc")
    assert s1["partial"] is True and s1["seeds_missing"] == [777]
    s2 = quality_protocol.write_summary(
        out, 4000, [42, 777], [_row(42), _row(777, psnr=24.0)], "abc")
    assert "partial" not in s2
    assert json.load(open(out))["final_val_psnr"]["median"] == 23.5


def test_load_prior_runs_schedule_gated(tmp_path):
    out = str(tmp_path / "quality.json")
    quality_protocol.write_summary(out, 4000, [42, 777], [_row(42)], "abc")
    assert set(quality_protocol.load_prior_runs(out, 4000)) == {42}
    assert quality_protocol.load_prior_runs(out, 8000) == {}
    assert quality_protocol.load_prior_runs(
        str(tmp_path / "absent.json"), 4000) == {}


def test_e2e_tiny_scene(tmp_path, monkeypatch):
    # Drive the full protocol (scene gen -> train -> tto -> eval summary)
    # at test_cli.py scale, then re-run after wiping the scratch: the
    # second pass must reuse the committed artifact without retraining.
    cfg = tmp_path / "cfg.yaml"
    scene = str(tmp_path / "scene")
    cfg.write_text(
        "dataset_name: 'custom'\n"
        "scene_name: 'synth'\n"
        "exp_name: 'quality'\n"
        f"root_dir: '{scene}'\n"
        f"feat_dir: '{scene}/DINO'\n"
        f"depth_dir: '{scene}/DPT'\n"
        f"out_dir: '{tmp_path}/out'\n"
        "max_steps: 4\n"
        "debug: True\n"
        "phototourism:\n  img_downscale: 1\n  use_cache: False\n"
        "nerf:\n  N_samples: 8\n  N_importance: 8\n  feat_dim: 8\n"
        "  D: 2\n  W: 32\n  skips: []\n"
        "t_net:\n  feat_dim: 8\n"
        "train:\n  batch_size: 64\n  ckpt_interval: 4\n"
        "  log_pose_interval: 2\n"
        "val:\n  log_interval: 4\n  chunk_size: 256\n"
    )
    monkeypatch.setattr(quality_protocol, "CONFIG", str(cfg))
    monkeypatch.setattr(quality_protocol, "SCENE_DIR", scene)
    monkeypatch.setattr(quality_protocol, "SCENE_KWARGS", dict(
        n_train=3, n_test=1, H=24, W=32, feat_hw=8, feat_dim=8, focal=24.0,
    ))
    monkeypatch.setattr(quality_protocol, "OUT_DIR", f"{tmp_path}/out")
    monkeypatch.setattr(
        quality_protocol, "ARTIFACT", str(tmp_path / "quality.json"))
    monkeypatch.setattr(quality_protocol, "TTO_KW", dict(
        batch_size=64, group_size=2, pose_epochs=1, appearance_epochs=1))

    quality_protocol.main(["--seeds", "42", "--steps", "4"])
    got = json.load(open(tmp_path / "quality.json"))
    assert "partial" not in got
    (run,) = got["runs"]
    assert run["seed"] == 42 and run["n_test_images"] == 1
    assert "final_val_psnr" in run and "tto_psnr_mean" in run

    # Scratch wipe -> artifact reuse (no retraining: the run dir is gone,
    # so any attempt to train would fail the reuse assertion below).
    import shutil

    shutil.rmtree(f"{tmp_path}/out")
    quality_protocol.main(["--seeds", "42", "--steps", "4"])
    got2 = json.load(open(tmp_path / "quality.json"))
    (run2,) = got2["runs"]
    assert run2["reused_from_artifact"] is True
    assert run2["final_val_psnr"] == run["final_val_psnr"]
    assert not os.path.isdir(f"{tmp_path}/out")
