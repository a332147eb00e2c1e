"""Weight converters: torch checkpoints -> framework-native assets.

    python -m upnerf.cli.convert_weights dino <ckpt.pth> <out.npz>
    python -m upnerf.cli.convert_weights dpt <ckpt.pt> <out.npz>
    python -m upnerf.cli.convert_weights lpips <out.npz>   # needs `lpips` pkg
    python -m upnerf.cli.convert_weights model <ref.ckpt> <result_dir> \\
        [--config cfg.yaml]   # trained reference run -> our run directory
    python -m upnerf.cli.convert_weights export <result_dir> <out.ckpt> \\
        [--ckpt last|best]    # our trained run -> reference Lightning ckpt

`model` converts a TRAINED reference Lightning checkpoint (train.py ->
`ckpts/*.ckpt`) into a run directory this repo's tto/eval/render_video
CLIs consume directly (config.yaml + orbax ckpts/) — migration without
retraining. See upnerf/utils/ref_ckpt.py.
"""

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["dino", "dpt", "lpips", "model", "export"])
    parser.add_argument("args", nargs="+")
    parser.add_argument("--config", default=None,
                        help="model: framework config yaml (defaults to the "
                        "checkpoint's own hyper_parameters)")
    parser.add_argument("--ckpt", default="last", choices=["last", "best"],
                        help="export: which checkpoint of the run to export")
    a = parser.parse_args(argv)
    n_required = {"dino": 2, "dpt": 2, "lpips": 1, "model": 2, "export": 2}[a.kind]
    if len(a.args) != n_required:
        parser.error(
            f"convert_weights {a.kind} takes exactly {n_required} positional "
            f"argument(s) after the kind (got {len(a.args)}) — see the module "
            "docstring for usage"
        )
    if a.kind == "model":
        from upnerf.utils.ref_ckpt import convert_reference_run

        convert_reference_run(a.args[0], a.args[1], a.config)
        return
    if a.kind == "export":
        from upnerf.utils.ref_ckpt import export_framework_run

        export_framework_run(a.args[0], a.args[1], ckpt=a.ckpt)
        return
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


if __name__ == "__main__":
    main()
