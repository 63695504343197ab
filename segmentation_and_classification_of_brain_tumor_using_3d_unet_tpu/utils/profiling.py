"""Tracing / profiling utilities (SURVEY.md section 5 'tracing').

The reference's observability is tqdm bars + wall-clock prints
(``training.py:284,243``). Here:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` (XProf/
    Perfetto traces viewable in TensorBoard);
  * ``StepTimer`` — per-step wall-clock with device sync, keeping the
    one-sync-per-window discipline;
  * ``annotate`` — named trace spans (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str = "logs/jax_trace",
          create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("jax trace written to %s", logdir)


def annotate(name: str):
    """Named span visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step statistics with explicit sync points.

    >>> timer = StepTimer(sync_every=10)
    >>> for batch in loader:
    ...     state, metrics = step(state, batch, key)
    ...     timer.tick(metrics["loss"])     # syncs every N steps only
    """

    def __init__(self, sync_every: int = 10):
        self.sync_every = max(1, sync_every)
        self.times: List[float] = []
        self._count = 0
        self._t0 = time.time()

    def tick(self, sync_value=None) -> Optional[float]:
        self._count += 1
        if self._count % self.sync_every:
            return None
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        now = time.time()
        per_step = (now - self._t0) / self.sync_every
        self.times.append(per_step)
        self._t0 = now
        return per_step

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": self._count}
        import numpy as np
        return {
            "steps": self._count,
            "mean_s": float(np.mean(self.times)),
            "median_s": float(np.median(self.times)),
            "min_s": float(np.min(self.times)),
            "steps_per_sec": float(1.0 / np.median(self.times)),
        }
