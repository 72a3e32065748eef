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


class WandbLogger:
    """Weights & Biases sink (fairseq progress_bar.py:392 WandBProgressBar
    equivalent). No-ops cleanly when wandb is not installed/configured."""

    def __init__(self, project: str, run_name: Optional[str] = None,
                 config: Optional[Dict] = None):
        self._run = None
        try:
            import wandb

            self._run = wandb.init(project=project, name=run_name,
                                   config=config or {})
        except Exception:
            pass  # offline image / library absent: silently disabled

    def log(self, stats: Dict, step: int, tag: str = "train"):
        if self._run is None:
            return
        self._run.log({f"{tag}/{k}": v for k, v in stats.items()}, step=step)

    def flush(self):
        pass


class StepWatchdog:
    """Hung-step watchdog (DistributedTimeoutWrapper equivalent,
    fairseq/distributed/distributed_timeout_wrapper.py:17): a daemon thread
    fires `on_timeout` if `beat()` is not called within `timeout_s` —
    catching a wedged collective/compile that would otherwise hang the job
    forever. Default action logs and SIGTERMs the process so the launcher
    can restart from the last checkpoint (the reference's recovery story)."""

    def __init__(self, timeout_s: float, on_timeout=None):
        import threading

        self.timeout_s = timeout_s
        self._on_timeout = on_timeout or self._default_action
        self._last = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)

    def _default_action(self):
        import os
        import signal
        import sys

        print(
            f"StepWatchdog: no heartbeat for {self.timeout_s}s — "
            "killing process for restart-from-checkpoint",
            file=sys.stderr, flush=True,
        )
        os.kill(os.getpid(), signal.SIGTERM)

    def start(self):
        import time

        self._last = time.monotonic()
        self._thread.start()
        return self

    def beat(self):
        import time

        self._last = time.monotonic()

    def stop(self):
        self._stop.set()

    def _watch(self):
        import time

        while not self._stop.wait(min(self.timeout_s / 4.0, 1.0)):
            if self._last is not None and (
                time.monotonic() - self._last > self.timeout_s
            ):
                self._on_timeout()
                return

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


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
