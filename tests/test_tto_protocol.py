"""Tests for the TTO-success protocol (train -> tto -> eval on a scene
where TTO is expected to land near val PSNR).

Same contract as test_quality_protocol.py: artifact resilience unit-tested
on synthetic rows, and the full pipeline glue driven e2e on a tiny
CPU-scale scene — including the noised-base TTO path (pose.noise 0.15),
the configuration the TPU protocol uses.
"""

import importlib.util
import json
import os

import numpy as np

_SPEC = importlib.util.spec_from_file_location(
    "tto_protocol",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "tto_protocol.py"),
)
tto_protocol = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(tto_protocol)


def _row(seed, steps=15000, psnr=28.0, tto=26.0):
    return {
        "seed": seed, "exp": f"tto_seed{seed}", "steps": steps,
        "final_val_psnr": psnr, "tto_psnr_mean": tto, "tto_psnr_min": tto,
        "tto_ssim_mean": 0.8, "gap_db": round(psnr - tto, 2),
        "pass_3db": psnr - tto <= 3.0, "n_test_images": 4,
    }


def test_write_summary_partial_then_pass_flag(tmp_path):
    out = str(tmp_path / "tto.json")
    s1 = tto_protocol.write_summary(out, 15000, [42, 777], [_row(42)], "abc")
    assert s1["partial"] is True and s1["seeds_missing"] == [777]
    assert s1["pass_3db_all"] is True
    s2 = tto_protocol.write_summary(
        out, 15000, [42, 777], [_row(42), _row(777, tto=20.0)], "abc")
    assert "partial" not in s2
    assert s2["pass_3db_all"] is False
    assert json.load(open(out))["gap_db"]["max"] == 8.0


def test_load_prior_runs_schedule_gated(tmp_path):
    out = str(tmp_path / "tto.json")
    tto_protocol.write_summary(out, 15000, [42], [_row(42)], "abc")
    assert set(tto_protocol.load_prior_runs(out, 15000)) == {42}
    assert tto_protocol.load_prior_runs(out, 30000) == {}


def test_tto_scratch_rev_gated(tmp_path, monkeypatch):
    """A surviving a_optimize dir from an OLDER protocol revision (or
    different TTO settings) must NOT be reused — it would relabel stale
    evidence with the current rev."""
    run_dir = str(tmp_path / "run")
    os.makedirs(os.path.join(run_dir, "a_optimize"))
    with open(os.path.join(run_dir, "a_optimize", "metrics.json"), "w") as f:
        json.dump({"0": {"psnr": 20.0}}, f)

    # no stamp at all (pre-stamp scratch) -> not reusable
    assert not tto_protocol.tto_scratch_reusable(run_dir)

    with open(tto_protocol._stamp_path(run_dir), "w") as f:
        json.dump(tto_protocol._stamp(), f)
    assert tto_protocol.tto_scratch_reusable(run_dir)

    monkeypatch.setattr(tto_protocol, "PROTOCOL_REV",
                        tto_protocol.PROTOCOL_REV + 1)
    assert not tto_protocol.tto_scratch_reusable(run_dir)
    monkeypatch.undo()

    monkeypatch.setattr(
        tto_protocol, "TTO_KW", dict(tto_protocol.TTO_KW, pose_epochs=999))
    assert not tto_protocol.tto_scratch_reusable(run_dir)


def test_tto_cli_blur_and_eval_every_inputs():
    """pose_blur accepts both the CLI string and the programmatic tuple
    form; eval_every<=0 maps to 'last epoch only' instead of ZeroDivision."""
    from upnerf.cli.tto import _parse_blur

    assert _parse_blur("4,2") == (4.0, 2.0)
    assert _parse_blur((4.0, 2.0)) == (4.0, 2.0)
    assert _parse_blur([4, 2]) == (4.0, 2.0)
    assert _parse_blur("") == ()
    assert _parse_blur(None) == ()

    # the modulo-skip stride: 0 -> effectively last-only, negatives clamp
    from upnerf.evaluate.tto import _eval_stride

    for e, want in [(0, 1 << 30), (1, 1), (10, 10), (-3, 1)]:
        assert _eval_stride(e) == want


def test_interleaved_test_views(tmp_path):
    """interleave_test spreads test indices through the arc interior (the
    default puts them at the end, extrapolating past the train views)."""
    from upnerf.data import synthetic

    meta = synthetic.generate_scene(
        str(tmp_path / "scene"), n_train=8, n_test=2, H=24, W=32, feat_hw=8,
        feat_dim=8, focal=24.0, interleave_test=True,
    )
    test_ids = sorted(int(k) for k, v in meta.items() if v["split"] == "test")
    train_ids = sorted(int(k) for k, v in meta.items() if v["split"] == "train")
    assert len(test_ids) == 2 and len(train_ids) == 8
    # interior: every test index has train neighbors on both sides
    assert min(train_ids) < min(test_ids) and max(test_ids) < max(train_ids)


def test_e2e_tiny_scene(tmp_path, monkeypatch):
    # Full protocol (scene gen -> train -> tto -> summary) at test_cli.py
    # scale, with pose.noise 0.15 so the TTO alignment runs through the
    # noised-base path; then re-run after wiping the scratch: the second
    # pass must reuse the committed artifact without retraining.
    cfg = tmp_path / "cfg.yaml"
    scene = str(tmp_path / "scene")
    cfg.write_text(
        "dataset_name: 'custom'\n"
        "scene_name: 'synth'\n"
        "exp_name: 'tto'\n"
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
        "pose:\n  noise: 0.15\n"
        "train:\n  batch_size: 64\n  ckpt_interval: 4\n"
        "  log_pose_interval: 2\n"
        "val:\n  log_interval: 4\n  chunk_size: 256\n"
    )
    monkeypatch.setattr(tto_protocol, "CONFIG", str(cfg))
    monkeypatch.setattr(tto_protocol, "SCENE_DIR", scene)
    monkeypatch.setattr(tto_protocol, "SCENE_KWARGS", dict(
        n_train=4, n_test=2, H=24, W=32, feat_hw=8, feat_dim=8, focal=24.0,
        interleave_test=True,
    ))
    monkeypatch.setattr(tto_protocol, "OUT_DIR", f"{tmp_path}/out")
    monkeypatch.setattr(tto_protocol, "ARTIFACT", str(tmp_path / "tto.json"))
    monkeypatch.setattr(tto_protocol, "TTO_KW", dict(
        batch_size=64, group_size=2, pose_epochs=1, appearance_epochs=1))

    tto_protocol.main(["--seeds", "42", "--steps", "4"])
    got = json.load(open(tmp_path / "tto.json"))
    assert "partial" not in got
    (run,) = got["runs"]
    assert run["seed"] == 42 and run["n_test_images"] == 2
    assert "gap_db" in run and "pass_3db" in run
    assert np.isfinite(run["tto_psnr_mean"])

    # Scratch wipe -> artifact reuse (no retraining possible: run dir gone).
    import shutil

    shutil.rmtree(f"{tmp_path}/out")
    tto_protocol.main(["--seeds", "42", "--steps", "4"])
    got2 = json.load(open(tmp_path / "tto.json"))
    (run2,) = got2["runs"]
    assert run2["reused_from_artifact"] is True
    assert run2["final_val_psnr"] == run["final_val_psnr"]
    assert not os.path.isdir(f"{tmp_path}/out")
