import argparse
import os

from upnerf import config as cfg


def test_default_loads_flat_keys():
    c = cfg.default()
    assert c["nerf.N_samples"] == 128
    assert c["nerf.N_importance"] == 128
    assert c["optimizer.lr"] == 5e-4
    assert c["optimizer.scheduler.lr_end"] == 5e-5
    assert c["pose.c2f"] == (0.1, 0.5)
    assert c["candidate_schedule"] == (0.1, 0.5)
    assert c["pose.noise"] == -1
    assert c["resume_ckpt"] is None


def test_literal_eval_and_tuples(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("a: '1e-3'\nb: '[1, 2]'\nc: hello\nd:\n  e: '2'\n")
    c = cfg.load(str(p))
    assert c["a"] == 1e-3
    assert c["b"] == (1, 2)
    assert c["c"] == "hello"
    assert c["d.e"] == 2


def test_merge_from_list_unchecked():
    c = {"x.y": 1}
    cfg.merge_from_list(c, ["x.y", "5", "new.key", "[0.1,0.5]"])
    assert c["x.y"] == 5
    assert c["new.key"] == (0.1, 0.5)


def test_merge_from_list_booleans():
    # CLI `key false` must become bool False, not the truthy string "false"
    # (regression: tpu.fused_trunk override was silently ignored).
    c = {}
    cfg.merge_from_list(
        c, ["a", "false", "b", "true", "c", "False", "d", "True", "e", "high"]
    )
    assert c["a"] is False
    assert c["b"] is True
    assert c["c"] is False
    assert c["d"] is True
    assert c["e"] == "high"


def test_parse_cli_and_save_roundtrip(tmp_path):
    scene = tmp_path / "scene.yaml"
    scene.write_text("scene_name: foo\nnerf:\n  N_samples: 16\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--config")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    c = cfg.parse_cli(parser, ["--config", str(scene), "train.batch_size", "64"])
    assert c["scene_name"] == "foo"
    assert c["nerf.N_samples"] == 16
    assert c["train.batch_size"] == 64
    # argparse attrs not already present are added (configs/config.py:70-73)
    assert c["config"] == str(scene)

    out = tmp_path / "resolved.yaml"
    cfg.save_yaml(c, str(out))
    c2 = cfg.get_from_path(str(out))
    assert c2["scene_name"] == "foo"
    assert c2["nerf.N_samples"] == 16
    assert c2["pose.c2f"] == (0.1, 0.5)
    assert os.path.exists(out)


def test_preset_resolution_and_merge_order(tmp_path):
    import pytest

    # packaged name resolves to the shipped preset file
    path = cfg.resolve_preset("best_pose")
    assert path.endswith(os.path.join("presets", "best_pose.yaml"))
    assert os.path.isfile(path)
    # a literal path wins over name lookup
    own = tmp_path / "mine.yaml"
    own.write_text("pose:\n  c2f: '[0.2, 0.6]'\n")
    assert cfg.resolve_preset(str(own)) == str(own)
    with pytest.raises(FileNotFoundError, match="best_pose"):
        cfg.resolve_preset("no_such_preset")

    scene = tmp_path / "scene.yaml"
    scene.write_text("scene_name: foo\npose:\n  c2f: '[0.3, 0.4]'\n")
    parser = argparse.ArgumentParser()
    parser.add_argument("--config")
    parser.add_argument("--preset", action="append", default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    # preset overrides the scene config...
    c = cfg.parse_cli(
        parser, ["--config", str(scene), "--preset", "best_pose"]
    )
    assert c["scene_name"] == "foo"
    assert c["pose.c2f"] == (0.1, 0.8)
    # ...but explicit `key value` CLI overrides still win over the preset
    c = cfg.parse_cli(
        parser,
        ["--config", str(scene), "--preset", "best_pose",
         "pose.c2f", "[0.1, 0.5]"],
    )
    assert c["pose.c2f"] == (0.1, 0.5)
    # no preset -> exact reference-parity recipe from the scene config
    c = cfg.parse_cli(parser, ["--config", str(scene)])
    assert c["pose.c2f"] == (0.3, 0.4)
