"""Cache builder CLI (reference prepare_phototourism.py:35-97).

Builds the train-split ray store with camera_noise=None (keeps COLMAP poses
and per-image near/far, prepare_phototourism.py:44-52) and writes the
memmap-able npy cache.

    python -m upnerf.cli.prepare_cache --config configs/<scene>.yaml
"""

from __future__ import annotations

import argparse


def main(hparams) -> None:
    from upnerf.data import build_arrays, cache_dir_for, load_scene_meta, save_cache

    meta = load_scene_meta(hparams, camera_noise=None)
    scene_np, store_np = build_arrays(
        meta,
        hparams.get("feat_dir"),
        hparams.get("depth_dir"),
        hparams["nerf.near"],
        hparams["nerf.far"],
    )
    cdir = cache_dir_for(hparams["root_dir"], meta.scale)
    save_cache(cdir, meta, scene_np, store_np)
    n = store_np["px"].shape[0]
    print(f"[upnerf] cached {n} rays for {meta.N_images_train} images -> {cdir}")


if __name__ == "__main__":
    from upnerf.config import parse_cli

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    main(parse_cli(parser))
