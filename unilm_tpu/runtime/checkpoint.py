"""Checkpoint manager: model + optimizer + data-iterator state, best-k
rotation, async save.

Equivalent of fairseq/checkpoint_utils.py:36-535 (save_checkpoint rotation /
atomic+async save / load with iterator state) built on orbax: orbax already
gives atomic directory commits and async array writes (the reference built
both by hand with iopath thread pools); the streaming data position
(infinibatch getstate) is stored alongside as JSON, restoring the
mid-epoch data stream exactly like fairseq's load_checkpoint :209.

Saves are TRULY async (fairseq's --write-checkpoints-asynchronously,
checkpoint_utils.py:36,535): `save` snapshots the arrays to host and
returns while the multi-GB write proceeds on orbax's background thread,
overlapping the next training steps. Ordering/durability contract:
- extra.json is written BEFORE the array write starts; the orbax commit
  (the atomic rename of the tmp dir to `state/`) is the completion bit.
- A step counts as existing only when BOTH extra.json and the committed
  `state/` dir are present, so a mid-save crash leaves a skippable
  partial and restore falls back to the previous step.
- The barrier runs at the START of the next save (one in-flight save at
  a time) and at interpreter exit (atexit), never on the training path.
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, tuple):
        return list(o)
    raise TypeError(str(type(o)))


class CheckpointManager:
    """Directory layout: <dir>/step_<N>/{state/, extra.json}."""

    def __init__(
        self,
        directory: str,
        keep_last: int = 3,
        keep_best: int = 0,
        best_metric: str = "loss",
        maximize_best: bool = False,
    ):
        import orbax.checkpoint as ocp

        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.keep_last = keep_last
        self.keep_best = keep_best
        self.best_metric = best_metric
        self.maximize = maximize_best
        self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._scores = {}  # step -> metric
        self._pending = set()  # steps issued by THIS process, commit at wait()
        atexit.register(self.wait)

    def wait(self):
        """Barrier on the in-flight async save (if any)."""
        self._ckptr.wait_until_finished()
        self._pending.clear()

    # ------------------------------------------------------------------ #
    def _step_dir(self, step: int) -> str:
        return os.path.join(self.dir, f"step_{step}")

    def _complete(self, step: int) -> bool:
        """extra.json present AND the orbax array write committed (the tmp
        dir atomically renamed to `state/`) — the async-save completion bit."""
        path = self._step_dir(step)
        if not os.path.exists(os.path.join(path, "extra.json")):
            return False
        # a save issued by this process WILL commit (wait() barriers before
        # any read); a partial with no in-flight writer is a crash leftover
        return step in self._pending or os.path.isdir(os.path.join(path, "state"))

    def all_steps(self, include_incomplete: bool = False):
        steps = []
        for name in os.listdir(self.dir):
            if name.startswith("step_") and not name.endswith(".tmp"):
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        if not include_incomplete:
            steps = [s for s in steps if self._complete(s)]
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # ------------------------------------------------------------------ #
    def save(
        self,
        step: int,
        state: Any,  # TrainState pytree
        data_state: Any = None,  # CheckpointableIterator.getstate()
        metrics: Optional[dict] = None,
    ):
        """verify_checkpoint_directory probe (checkpoint_utils.py:837) is
        subsumed by orbax's atomic commit; extra.json carries data/meta.

        Returns as soon as the arrays are snapshotted — the write overlaps
        subsequent training steps; `wait()` (or the next save) barriers."""
        path = self._step_dir(step)
        # one in-flight save at a time: barrier on the PREVIOUS one
        self.wait()
        os.makedirs(path, exist_ok=True)
        # extra.json first; the orbax commit is the completion bit (_complete)
        extra = {
            "step": step,
            "data_state": data_state,
            "metrics": metrics or {},
        }
        with open(os.path.join(path, "extra.json"), "w") as f:
            json.dump(extra, f, default=_json_default)
        self._ckptr.save(os.path.join(path, "state"), state, force=True)
        self._pending.add(step)
        if metrics and self.best_metric in metrics:
            self._scores[step] = metrics[self.best_metric]
        self._rotate()

    def _rotate(self):
        """keep-last-N + keep-best-K rotation (checkpoint_utils.py:36-130).

        Counts the in-flight (not-yet-committed) newest save in the
        keep-last window — it is always the most recent step, so it can
        never be rotated out from under its own background write; stale
        crash partials age out of the window like any other step."""
        steps = self.all_steps(include_incomplete=True)
        keep = set(steps[-self.keep_last :] if self.keep_last else steps)
        if self.keep_best and self._scores:
            ranked = sorted(
                self._scores.items(), key=lambda kv: kv[1], reverse=self.maximize
            )
            keep |= {s for s, _ in ranked[: self.keep_best]}
        for s in steps:
            if s not in keep:
                shutil.rmtree(self._step_dir(s), ignore_errors=True)
                self._scores.pop(s, None)

    # ------------------------------------------------------------------ #
    def restore(self, abstract_state: Any, step: Optional[int] = None):
        """Returns (state, data_state, metrics) or None if no checkpoint.
        abstract_state: pytree of jax.ShapeDtypeStruct (jax.eval_shape of the
        state constructor) — restores with correct shardings."""
        self.wait()  # in-process restore-after-save
        steps = [step] if step is not None else list(reversed(self.all_steps()))
        for s in steps:
            path = self._step_dir(s)
            if not self._complete(s):
                continue  # incomplete save (crash mid-write): skip
            state = self._ckptr.restore(os.path.join(path, "state"), abstract_state)
            with open(os.path.join(path, "extra.json")) as f:
                extra = json.load(f)
            return state, extra.get("data_state"), extra.get("metrics", {})
        return None
