"""Progress logging sinks: stdout, JSONL, TensorBoard (if available).

Equivalent of fairseq/logging/progress_bar.py:331-445 (json/tensorboard/W&B
progress wrappers) and beit TensorboardLogger (beit/utils.py:178)."""

from __future__ import annotations

import json
import sys
import time
from typing import Dict, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, stream=None):
        self._fh = open(path, "a") if path else (stream or sys.stdout)

    def log(self, stats: Dict, step: int, tag: str = "train"):
        rec = {"tag": tag, "step": step, "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in stats.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()


class TensorboardLogger:
    """Lazily imports a SummaryWriter; no-ops if tensorboard is absent."""

    def __init__(self, logdir: str):
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch is baked in

            self._writer = SummaryWriter(logdir)
        except Exception:
            try:
                from flax.metrics.tensorboard import SummaryWriter

                self._writer = SummaryWriter(logdir)
            except Exception:
                self._writer = None

    def log(self, stats: Dict, step: int, tag: str = "train"):
        if self._writer is None:
            return
        for k, v in stats.items():
            try:
                self._writer.add_scalar(f"{tag}/{k}", float(v), step)
            except Exception:
                pass

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, stats: Dict, step: int, tag: str = "train"):
        for l in self.loggers:
            l.log(stats, step, tag)


def find_nonfinite(tree) -> Dict[str, int]:
    """NanDetector equivalent (fairseq/nan_detector.py:14): report which
    leaves contain NaN/Inf. Host-side, call on grads/params when a step's
    loss goes non-finite."""
    import jax
    import numpy as np

    bad = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        n = int((~np.isfinite(arr)).sum())
        if n:
            key = "/".join(
                k.key if hasattr(k, "key") else str(getattr(k, "idx", k)) for k in path
            )
            bad[key] = n
    return bad
