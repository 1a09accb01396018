"""Shared utilities: logging and wall-clock timers."""

from __future__ import annotations

import logging
import time
from collections import defaultdict

from ..config import (  # noqa: F401  (re-export config helpers like the reference)
    dict2namespace,
    namespace2dict,
    merge_configs,
    update_configs,
    load_yaml_config,
    save_config,
)

_LOG_FORMAT = "[%(asctime)s %(name)s %(levelname)s] %(message)s"


def get_logger(level: str = "INFO", name: str = "nerfmatch_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_LOG_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
    logger.setLevel(getattr(logging, level.upper()))
    logger.propagate = False
    return logger


class Timers:
    """Lightweight wall-clock timers mirroring the reference's eval timers
    (``nerfmatch_evaluator.py:180,454,621``): accumulate per-key durations,
    summarize as mean seconds."""

    def __init__(self):
        self.records = defaultdict(list)
        self._starts = {}

    def start(self, key: str) -> None:
        self._starts[key] = time.perf_counter()

    def stop(self, key: str) -> float:
        dt = time.perf_counter() - self._starts.pop(key)
        self.records[key].append(dt)
        return dt

    def mean(self, key: str) -> float:
        rec = self.records.get(key, [])
        return sum(rec) / max(len(rec), 1)

    def summary(self) -> dict:
        return {k: self.mean(k) for k in self.records}
