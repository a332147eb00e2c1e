"""Weight converters: torch checkpoints -> npz assets.

    python -m upnerf.cli.convert_weights dino <ckpt.pth> <out.npz>
    python -m upnerf.cli.convert_weights dpt <ckpt.pt> <out.npz>
    python -m upnerf.cli.convert_weights lpips <out.npz>   # needs `lpips` pkg
"""

import argparse

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["dino", "dpt", "lpips"])
    parser.add_argument("args", nargs="+")
    a = parser.parse_args()
    if a.kind == "dino":
        from upnerf.features.convert import convert_dino_vit

        convert_dino_vit(a.args[0], a.args[1])
    elif a.kind == "dpt":
        from upnerf.features.convert import convert_dpt

        convert_dpt(a.args[0], a.args[1])
    else:
        from upnerf.evaluate.lpips import convert_from_torch

        convert_from_torch(a.args[0])
    print("converted.")
