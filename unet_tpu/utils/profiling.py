"""Tracing / profiling hooks (SURVEY.md §5: the reference has none —
only tqdm bars; here we expose jax.profiler traces and throughput
accounting as first-class utilities).

* ``trace(logdir)`` — context manager around hot regions; produces a
  Perfetto/TensorBoard-readable trace (pass ``profile_dir`` in the train
  config or --profile-dir on the CLI).
* ``StepTimer`` — epoch/step wall-clock + slices/sec accounting with a
  trustworthy device sync (scalar readback; ``block_until_ready`` is not
  reliable on all PJRT plugins — see bench.py).
* ``nan_guard`` — enables jax_debug_nans (the sanitizer analogue).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(str(logdir)):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named sub-region inside a trace (TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Accumulates per-epoch step timings and derives throughput."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = None
        self.steps: List[float] = []

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, sync_value=None) -> float:
        """Stop the current step; optionally force a device sync by
        reading back a scalar (pass the step's loss)."""
        if sync_value is not None:
            float(sync_value)
        dt = time.time() - self._t0
        self.steps.append(dt)
        return dt

    def summary(self, items_per_step: int = 1) -> Dict[str, float]:
        if not self.steps:
            return {'steps': 0, 'total_s': 0.0, 'mean_ms': 0.0,
                    'items_per_sec': 0.0}
        total = sum(self.steps)
        return {
            'steps': len(self.steps),
            'total_s': total,
            'mean_ms': 1e3 * total / len(self.steps),
            'items_per_sec': items_per_step * len(self.steps) / total,
        }


def nan_guard(enable: bool = True) -> None:
    """Fail fast with a traceback on the first NaN in any jitted value
    (jax_debug_nans) — the JAX-native sanitizer (SURVEY.md §5)."""
    import jax
    jax.config.update('jax_debug_nans', bool(enable))
