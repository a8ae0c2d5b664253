"""JSONL-first logger with optional wandb.

Counterpart of the reference's ``Logger``
(reference: active_inference_diffusion/utils/logger.py:11-78). JSONL is the
primary sink (wandb is absent in many TPU pods); wandb attaches when the
package is importable and enabled.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _scalarize(value: Any) -> Any:
    if hasattr(value, "item") and getattr(value, "size", 2) == 1:
        return value.item()
    if isinstance(value, np.ndarray):
        return value.tolist()
    if hasattr(value, "tolist"):
        try:
            return value.tolist()
        except Exception:
            return str(value)
    return value


class Logger:
    def __init__(
        self,
        use_wandb: bool = False,
        project_name: str = "active-inference-diffusion-tpu",
        experiment_name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        log_dir: str = "logs",
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.log_file = self.log_dir / f"{experiment_name or 'experiment'}.jsonl"
        self._start = time.time()

        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project_name, name=experiment_name, config=config)
                self.wandb = wandb
            except Exception as e:  # wandb missing or offline init failure
                print(f"wandb unavailable ({e}); logging to JSONL only")

        if config is not None:
            with open(self.log_dir / f"{experiment_name or 'experiment'}_config.json", "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, metrics: Dict[str, Any], step: int):
        processed = {k: _scalarize(v) for k, v in metrics.items()}
        processed["step"] = step
        processed["wall_time"] = time.time() - self._start
        if self.wandb is not None:
            self.wandb.log(processed, step=step)
        with open(self.log_file, "a") as f:
            f.write(json.dumps(processed, default=str) + "\n")

    def log_video(self, video: np.ndarray, caption: str, step: int):
        if self.wandb is not None:
            self.wandb.log(
                {caption: self.wandb.Video(video, fps=30, format="mp4")}, step=step
            )

    def finish(self):
        if self.wandb is not None:
            self.wandb.finish()
