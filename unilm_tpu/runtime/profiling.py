"""Tracing/profiling spans (SURVEY.md §5).

Equivalent of the reference's torch.autograd.profiler.record_function spans
around train_inner/reduce-grads/clip-grads/optimizer (fairseq_cli/train.py:375,
fairseq/trainer.py:905-951) and NVTX emission under --profile
(train.py:600): jax named scopes show up in XLA HLO (visible in profiler
traces), TraceAnnotation marks host spans, and start/stop_trace dumps a
TensorBoard-loadable profile."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


def named_scope(name: str):
    """Annotates ops traced within — appears in HLO + profiler timelines
    (the record_function equivalent for jitted code)."""
    return jax.named_scope(name)


def trace_annotation(name: str):
    """Host-side span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile(logdir: Optional[str]):
    """`with profile('/tmp/prof'):` captures a device trace (the --profile /
    emit_nvtx equivalent); None disables."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock span accounting for the train loop (train_wall/reduce
    meters in fairseq logging)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
