"""Offline preprocessing CLI: DINO features + DPT depth for a scene.

Replaces preprocess/save_dino_feature.py, preprocess/save_dpt_depth.py and
the preprocess_all.sh drivers:

    python -m upnerf.cli.preprocess --image_dir <dir> --save_dir <root> \
        [--tsv_path <scene.tsv>] [--what dino dpt]

Requires converted weight assets (UPNERF_DINO_WEIGHTS / UPNERF_DPT_WEIGHTS;
see upnerf.features.convert).
"""

from __future__ import annotations

import argparse
import os
from glob import glob


def collect_images(image_dir: str, tsv_path=None):
    if tsv_path is None:
        names = sorted(os.path.basename(p) for p in glob(os.path.join(image_dir, "*")))
    else:
        import pandas as pd

        files = pd.read_csv(tsv_path, sep="\t")
        files = files[~files["id"].isnull()]
        names = list(files["filename"])
    return [os.path.join(image_dir, n) for n in names]


def main(args) -> None:
    from upnerf.features import dino, dpt

    paths = collect_images(args.image_dir, args.tsv_path)
    print(f"[preprocess] {len(paths)} images")

    if "dino" in args.what:
        extractor = dino.load_dino(args.dino_weights)
        if extractor is None:
            raise SystemExit(
                "DINO weights unavailable: set UPNERF_DINO_WEIGHTS to a "
                "converted dino_vits8 npz (upnerf.features.convert)"
            )
        dino.save_features(
            extractor, paths, os.path.join(args.save_dir, "DINO")
        )
    if "dpt" in args.what:
        model = dpt.load_dpt(args.dpt_weights)
        if model is None:
            raise SystemExit(
                "DPT weights unavailable: set UPNERF_DPT_WEIGHTS to a "
                "converted dpt_large npz (upnerf.features.convert)"
            )
        dpt.save_depths(model, paths, os.path.join(args.save_dir, "DPT"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--tsv_path", default=None)
    parser.add_argument(
        "--what", nargs="+", default=["dino", "dpt"], choices=["dino", "dpt"]
    )
    parser.add_argument("--dino_weights", default=None)
    parser.add_argument("--dpt_weights", default=None)
    main(parser.parse_args())
