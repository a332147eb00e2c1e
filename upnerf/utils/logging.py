"""Metrics/image logging.

The reference logs scalars and rendered maps to Weights & Biases
(train.py:53-57, models/nerf_system.py:209-217,276-307). This environment
has no network, so the default sink is a JSONL metrics stream + PNG image
dumps under the experiment dir (W&B-compatible layout: one record per log
call with `step`). A `wandb` sink engages automatically when the package is
importable and UPNERF_WANDB=1.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: Optional[bool] = None, config=None):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.img_dir = os.path.join(log_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("UPNERF_WANDB") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=os.environ.get("UPNERF_WANDB_PROJECT", "upnerf-tpu"),
                    config=config,
                )
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, step: int, name: str, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8 or float in [0, 1]."""
        from PIL import Image

        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        safe = name.replace("/", "_")
        Image.fromarray(img).save(
            os.path.join(self.img_dir, f"{safe}_{step:08d}.png")
        )
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(img)}, step=step)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
