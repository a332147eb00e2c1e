"""CLI-surface smoke tests: drive every console entry point end-to-end on a
tiny synthetic scene (the reference exposes the same surfaces via train.py,
tto.py, eval.py; prepare_phototourism.py; the video path completes
datasets/phototourism.py:472-494).

These run the actual `main()` functions with parsed args — the same code
path as `python -m upnerf.cli.*` — so config-coercion/plumbing bugs (e.g.
string "false" booleans) surface here rather than on the TPU.
"""

import argparse
import json
import os

import numpy as np
import pytest

from upnerf.config import parse_cli
from upnerf.data import synthetic


@pytest.fixture(scope="module")
def proto_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_proto")
    scene = os.path.join(root, "scene")
    synthetic.generate_scene(
        str(scene), n_train=3, n_test=1, H=24, W=32, feat_hw=8, feat_dim=8,
        focal=24.0,
    )
    return str(root), str(scene)


def _train_hparams(root, scene, extra=()):
    cfg = os.path.join(root, "cfg.yaml")
    if not os.path.isfile(cfg):
        with open(cfg, "w") as f:
            f.write(
                "dataset_name: 'custom'\n"
                "scene_name: 'synth'\n"
                "exp_name: 'cli_smoke'\n"
                f"root_dir: '{scene}'\n"
                f"feat_dir: '{scene}/DINO'\n"
                f"depth_dir: '{scene}/DPT'\n"
                f"out_dir: '{root}/out'\n"
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
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parse_cli(parser, ["--config", cfg, *extra])


def test_train_cli(proto_dir):
    root, scene = proto_dir
    from upnerf.cli.train import main

    main(_train_hparams(root, scene))
    run_dir = os.path.join(root, "out", "synth", "cli_smoke")
    assert os.path.isfile(os.path.join(run_dir, "config.yaml"))
    assert os.path.isfile(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert any("loss" in m for m in lines)
    # gauge-free pose metrics reach the log
    assert any("train/pose_R_rel" in m for m in lines)
    assert os.path.isdir(os.path.join(run_dir, "ckpts"))


def test_tto_and_eval_cli(proto_dir, capsys):
    root, scene = proto_dir
    run_dir = os.path.join(root, "out", "synth", "cli_smoke")
    if not os.path.isdir(run_dir):  # ordering guard when run alone
        from upnerf.cli.train import main as train_main

        train_main(_train_hparams(root, scene))

    from upnerf.cli.tto import main as tto_main

    args = argparse.Namespace(
        result_dir=run_dir, ckpt="last", batch_size=64, optimize_num=-1,
        group_size=2, pose_epochs=1, appearance_epochs=1,
    )
    tto_main(args)
    metrics_path = os.path.join(run_dir, "a_optimize", "metrics.json")
    assert os.path.isfile(metrics_path)
    with open(metrics_path) as f:
        metrics = json.load(f)
    assert len(metrics) == 1  # one test image
    (rec,) = metrics.values()
    assert "psnr" in rec and np.isfinite(rec["psnr"])

    from upnerf.cli.eval import main as eval_main

    eval_main(argparse.Namespace(result_dir=run_dir, ckpt="last"))
    out = capsys.readouterr().out
    assert "train/pose_R_rel" in out
    assert "PSNR" in out


def test_render_video_cli(proto_dir):
    root, scene = proto_dir
    run_dir = os.path.join(root, "out", "synth", "cli_smoke")
    if not os.path.isdir(run_dir):
        from upnerf.cli.train import main as train_main

        train_main(_train_hparams(root, scene))

    from upnerf.cli.render_video import main as rv_main

    out_dir = os.path.join(root, "video")
    rv_main(
        argparse.Namespace(
            result_dir=run_dir, ckpt="last", anchor=0, frames=2, scale=1.0,
            out=out_dir,
        )
    )
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) >= 2

    # --fast: interval-tightened serving render (upnerf/render/fast.py)
    fast_dir = os.path.join(root, "video_fast")
    rv_main(
        argparse.Namespace(
            result_dir=run_dir, ckpt="last", anchor=0, frames=1, scale=1.0,
            out=fast_dir, fast=True, fast_probe=8, fast_samples=8,
            fast_importance=4,
        )
    )
    import numpy as np
    from PIL import Image

    frame = np.asarray(Image.open(os.path.join(fast_dir, "frame_000.png")))
    assert frame.shape[-1] == 3 and np.isfinite(frame).all()


def test_prepare_cache_cli(proto_dir):
    root, scene = proto_dir
    from upnerf.cli.prepare_cache import main as cache_main

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    cfg = os.path.join(root, "cfg.yaml")
    _train_hparams(root, scene)  # ensure cfg exists
    hp = parse_cli(parser, ["--config", cfg])
    cache_main(hp)
    from upnerf.data.cache import cache_dir_for, load_cache

    cdir = cache_dir_for(scene, 1)
    assert os.path.isdir(cdir)
    meta, scene_np, store_np = load_cache(cdir)
    assert store_np["rgb"].dtype == np.uint8


def test_tto_shard_and_eval_merge(tmp_path, capsys):
    """Multi-host TTO scale-out: `--shard i/n` strides the test images,
    each shard writes its own metrics file, eval merges them."""
    root = str(tmp_path)
    scene = os.path.join(root, "scene")
    synthetic.generate_scene(
        scene, n_train=3, n_test=3, H=24, W=32, feat_hw=8, feat_dim=8,
        focal=24.0,
    )
    from upnerf.cli.train import main as train_main

    train_main(_train_hparams(root, scene))
    run_dir = os.path.join(root, "out", "synth", "cli_smoke")

    from upnerf.cli.tto import main as tto_main

    def shard_args(spec):
        return argparse.Namespace(
            result_dir=run_dir, ckpt="last", batch_size=64, optimize_num=-1,
            group_size=2, pose_epochs=1, appearance_epochs=1, shard=spec,
        )

    tto_main(shard_args("0/2"))  # images 0, 2
    tto_main(shard_args("1/2"))  # image 1
    a_dir = os.path.join(run_dir, "a_optimize")
    with open(os.path.join(a_dir, "metrics.shard0of2.json")) as f:
        m0 = json.load(f)
    with open(os.path.join(a_dir, "metrics.shard1of2.json")) as f:
        m1 = json.load(f)
    assert set(m0) == {"0", "2"} and set(m1) == {"1"}
    assert not os.path.isfile(os.path.join(a_dir, "metrics.json"))

    from upnerf.cli.eval import main as eval_main

    eval_main(argparse.Namespace(result_dir=run_dir, ckpt="last"))
    out = capsys.readouterr().out
    assert "PSNR" in out  # merged across both shard files

    # an overflowing shard index owns nothing and exits cleanly
    tto_main(shard_args("3/4"))
    # 3 test images striped 3/4 -> image 3 doesn't exist -> no-op is fine
    with pytest.raises(SystemExit):
        tto_main(shard_args("2"))  # malformed spec
