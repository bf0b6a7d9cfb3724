"""Tracing/profiling + numerics-debug harness (SURVEY.md §6.1-6.2).

The reference has no profiling or sanitizing machinery at all (SURVEY.md §6);
here:

  * `trace(dir)` wraps a code region in a jax.profiler trace (viewable in
    TensorBoard / xprof). Gated: profiling is not supported on every PJRT
    plugin (the axon tunnel backend rejects it), so failure to start a trace
    degrades to a no-op with a warning instead of killing training.
  * `StepTimer` measures REAL step time. On the axon platform
    jax.block_until_ready is a silent no-op, so the timer synchronizes by
    fetching a scalar to the host before reading the clock.
  * `enable_nan_debug()` flips jax_debug_nans so the first NaN-producing op
    raises with a traceback (the §6.2 "sanitizer" for a pure-functional
    program); deterministic PRNG threading is the default everywhere else.
"""

from __future__ import annotations

import contextlib
import time
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> float:
    """Force device->host completion; returns the fetched scalar.
    The ONLY reliable sync on the axon platform (block_until_ready no-ops)."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace region; degrades to no-op where unsupported."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        warnings.warn(f"profiler trace unavailable on this backend: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                warnings.warn(f"profiler stop failed: {e}")


class StepTimer:
    """Wall-clock step timer with true device sync.

    timer = StepTimer(audio_sec_per_batch)
    for ...: out = step(...); timer.tick(out["loss"])
    timer.summary() -> {"mean_ms", "p50_ms", "p95_ms", "audio_sec_per_sec"}
    """

    def __init__(self, audio_sec_per_batch: Optional[float] = None,
                 warmup: int = 2):
        self.audio_sec_per_batch = audio_sec_per_batch
        self.warmup = warmup
        self._times = []
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def tick(self, sync_on) -> float:
        sync(sync_on)
        now = time.perf_counter()
        dt = now - self._last if self._last is not None else 0.0
        self._last = now
        self._times.append(dt)
        return dt

    def summary(self) -> dict:
        ts = np.asarray(self._times[self.warmup:] or self._times)
        out = {
            "steps": int(len(ts)),
            "mean_ms": float(ts.mean() * 1e3),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p95_ms": float(np.percentile(ts, 95) * 1e3),
        }
        if self.audio_sec_per_batch:
            out["audio_sec_per_sec"] = float(
                self.audio_sec_per_batch / max(ts.mean(), 1e-9))
        return out


def enable_nan_debug(enable: bool = True) -> None:
    """First NaN raises inside jitted code (debug runs / CI numerics gate)."""
    jax.config.update("jax_debug_nans", enable)
