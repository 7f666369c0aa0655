"""Periodic image logging during training.

Re-design of the Lightning ``ImageLogger`` callback
(``/root/reference/main.py:364-567``): every N steps, run
``model.log_images`` on the current batch and write PNG grids (train) or
per-sample files named by the dataset ``file_name`` (test), with
shard-suffixed names for multi-host runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from frido_tpu.utils import visualize as vz


class ImageLogger:
    def __init__(self, logdir: str, every_steps: int = 1000,
                 max_images: int = 8, shard_idx: int = -1):
        self.save_dir = os.path.join(logdir, "images")
        self.every_steps = every_steps
        self.max_images = max_images
        self.shard_idx = shard_idx

    def should_log(self, step: int) -> bool:
        return self.every_steps > 0 and step % self.every_steps == 0

    def log_train(self, model, params, batch: Dict[str, Any], step: int,
                  split: str = "train", dataset=None, rng=None,
                  sample: bool = False) -> None:
        logs = model.log_images(params, batch, rng=rng, n=self.max_images,
                                sample_flag=sample, dataset=dataset)
        out = os.path.join(self.save_dir, split)
        os.makedirs(out, exist_ok=True)
        for key, val in logs.items():
            if key == "file_name" or not isinstance(val, np.ndarray):
                continue
            grid = vz.make_grid(val, nrow=4)
            vz.save_image(
                grid, os.path.join(out, f"{key}_gs-{step:06}.png"))

    def log_test(self, logs: Dict[str, Any], out_dir: str,
                 keys=("sample", "inputs", "conditioning")) -> None:
        suffix = f"_r{self.shard_idx}" if self.shard_idx >= 0 else ""
        names = logs.get("file_name")
        for key in keys:
            if key not in logs:
                continue
            d = os.path.join(out_dir, "img", key)
            os.makedirs(d, exist_ok=True)
            for i, arr in enumerate(logs[key]):
                if names is not None:
                    base = os.path.splitext(os.path.basename(
                        str(names[i])))[0]
                else:
                    base = f"{key}_{i:06}"
                vz.save_image(arr, os.path.join(d, base + suffix + ".png"))
