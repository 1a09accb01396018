"""Experiment logging: JSONL scalar streams + console, with optional
TensorBoard when the package is available.

Replaces the reference's TensorBoardLogger usage (``nerf_trainer.py:324``)
with a dependency-light JSONL stream (one line per logged step) that the
benchmark/summary tooling reads back; TB is attached opportunistically.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, log_dir, name: str = "metrics"):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.log_dir / f"{name}.jsonl"
        self._fh = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(str(self.log_dir))
        except Exception:
            pass

    def log_scalars(self, step: int, scalars: dict, prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log_text(self, tag: str, text: str):
        (self.log_dir / f"{tag.replace('/', '_')}.txt").write_text(str(text))
        if self._tb is not None:
            self._tb.add_text(tag, str(text))

    def log_image(self, step: int, tag: str, img):
        """Save an (H, W, 3) float image panel as png."""
        import numpy as np
        from PIL import Image

        arr = (np.clip(np.asarray(img), 0, 1) * 255).astype("uint8")
        out = self.log_dir / "images" / f"{tag.replace('/', '_')}_{step}.png"
        out.parent.mkdir(exist_ok=True)
        Image.fromarray(arr).save(out)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
