"""Training CLI.

Usage (mirrors reference train.py:82-91):
    python -m upnerf.cli.train --config configs/<scene>.yaml [key value ...]

Resolves default.yaml -> scene yaml -> `key value` CLI overrides, saves the
resolved config next to the checkpoints (reloaded later by tto/eval,
train.py:78), auto-resumes from the last checkpoint (train.py:34-40), and
runs the jitted training loop.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(hparams):
    assert (hparams["pose.optimize"] is True) or (
        hparams["pose.optimize"] is False and hparams["pose.c2f"] is None
    ), "if you don't optimize poses, pose.c2f must be None"  # train.py:24-26

    np.random.seed(hparams.get("seed", 42))

    # Multi-controller runs (the DDP replacement, train.py:70-72): launch
    # this same CLI once per host. `dist.multiprocess true` on TPU pod
    # slices auto-discovers everything; explicit coordinator/process keys
    # are for CPU smoke runs and non-TPU clusters. Must happen before any
    # JAX computation creates the backend client.
    if hparams.get("dist.multiprocess") or hparams.get("dist.num_processes"):
        from upnerf import parallel

        parallel.initialize(
            coordinator_address=hparams.get("dist.coordinator"),
            num_processes=hparams.get("dist.num_processes"),
            process_id=hparams.get("dist.process_id"),
            initialization_timeout=hparams.get("dist.init_timeout"),
        )

    from upnerf.config import save_yaml
    from upnerf.parallel import is_main_process
    from upnerf.train.loop import Trainer

    save_dir = os.path.join(
        hparams["out_dir"], hparams["scene_name"], hparams["exp_name"]
    )
    if is_main_process():
        os.makedirs(save_dir, exist_ok=True)
        save_yaml(hparams, os.path.join(save_dir, "config.yaml"))

    trainer = Trainer(hparams)
    trainer.fit()
    return trainer


if __name__ == "__main__":
    from upnerf.config import parse_cli

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", help="Path to config file.", required=True)
    parser.add_argument(
        "--preset", action="append", default=None,
        help="Measured recipe bundle to merge after the scene config "
        "(packaged name like 'best_pose', or a yaml path; repeatable). "
        "Omit for exact reference-parity training.",
    )
    parser.add_argument(
        "opts",
        nargs=argparse.REMAINDER,
        help="Modify hparams: `key value` pairs, e.g. train.batch_size 1024",
    )
    main(parse_cli(parser))
