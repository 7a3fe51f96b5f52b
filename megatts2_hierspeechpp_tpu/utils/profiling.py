"""Profiling / tracing utilities (greenfield vs the reference, SURVEY.md §5).

- `trace(dir)`: context manager around jax.profiler for TensorBoard-viewable
  TPU traces.
- `Throughput`: audio-seconds/sec and tokens/sec counters for serving loops.
- `annotate`: named trace spans (shows up in the profiler timeline).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


@dataclass
class Throughput:
    """Streaming counters: report audio-seconds/s/chip and tokens/s."""

    started: float = field(default_factory=time.perf_counter)
    audio_seconds: float = 0.0
    tokens: int = 0
    steps: int = 0

    def add(self, audio_seconds: float = 0.0, tokens: int = 0):
        self.audio_seconds += audio_seconds
        self.tokens += tokens
        self.steps += 1

    def report(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self.started, 1e-9)
        n_dev = max(jax.device_count(), 1)
        return {
            "wall_seconds": dt,
            "audio_seconds_per_sec": self.audio_seconds / dt,
            "audio_seconds_per_sec_per_chip": self.audio_seconds / dt / n_dev,
            "tokens_per_sec": self.tokens / dt,
            "steps_per_sec": self.steps / dt,
        }
