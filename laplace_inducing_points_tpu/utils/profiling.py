"""Tracing and step-timing instrumentation.

The reference has almost none of this (SURVEY.md §5.1: one commented-out
``jax.profiler`` call and tqdm postfixes). Here:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device execution,
* ``StepTimer`` — wall-clock EMA/percentile step metrics with JSONL export,
* ``annotate`` — named ``TraceAnnotation`` regions visible in traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lipt_trace", sync: bool = True):
    """Capture a device trace: ``with trace("/tmp/t"): step()``.

    ``sync=True`` (default) inserts a device barrier — a trivial
    ``block_until_ready`` on a fresh computation — before ``stop_trace()``,
    so async-dispatched work launched inside the region is on the trace
    even when the caller never host-syncs its outputs (typical on TPU,
    where un-synced dispatch would otherwise be silently truncated from
    the trace). Pass ``sync=False`` only when the traced region is known
    to end host-synced and the extra tiny dispatch would pollute the tail
    of the timeline.
    """
    import jax.numpy as jnp
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        if sync:
            # barrier: all previously dispatched work must complete before
            # this result is ready (single-stream device execution order)
            jax.block_until_ready(jnp.zeros(()) + 0.0)
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step metrics with EMA and summary percentiles.

    Usage::

        timer = StepTimer("inducing_step")
        with timer:
            z, opt_state, loss = optimize_step(...)
            jax.block_until_ready(loss)
        print(timer.summary())
    """

    def __init__(self, name: str, ema: float = 0.9):
        self.name = name
        self.ema_coef = ema
        self.ema: Optional[float] = None
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        self.ema = dt if self.ema is None else \
            self.ema_coef * self.ema + (1 - self.ema_coef) * dt
        return False

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {"name": self.name, "steps": 0}
        xs = sorted(self.samples)
        n = len(xs)
        return {
            "name": self.name,
            "steps": n,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p90_s": xs[min(int(0.9 * n), n - 1)],
            "last_s": self.samples[-1],
            "ema_s": self.ema,
        }

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(self.summary()) + "\n")
