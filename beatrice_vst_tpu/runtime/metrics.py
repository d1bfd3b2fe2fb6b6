"""Observability: per-engine counters and latency histograms.

The reference has no metrics at all (SURVEY.md section 5.5); a batched
streaming service needs them.  Tracked per engine (per host): ticks,
streams-active, frames/s, audio-seconds/s, p50/p99 tick latency, underruns
(ticks exceeding the 10 ms frame budget -- the real-time contract of
src/vst/processor.cc:103).
"""

from __future__ import annotations

import time

import numpy as np

FRAME_BUDGET_S = 0.010


class EngineMetrics:
    def __init__(self, window: int = 1024):
        self.window = window
        self._tick_times: list[float] = []
        self.ticks = 0
        self.frames = 0
        self.underruns = 0
        self.last_error = None  # scheduler failure visibility (server._loop)
        self.started = time.monotonic()

    def record_tick(self, duration_s: float, n_active: int, frames_per_tick: int) -> None:
        self.ticks += 1
        self.frames += n_active * frames_per_tick
        budget = FRAME_BUDGET_S * frames_per_tick
        if duration_s > budget:
            self.underruns += 1
        self._tick_times.append(duration_s)
        if len(self._tick_times) > self.window:
            self._tick_times = self._tick_times[-self.window:]

    def snapshot(self, n_active: int) -> dict:
        t = np.asarray(self._tick_times[-self.window:] or [0.0])
        elapsed = max(time.monotonic() - self.started, 1e-9)
        return {
            "ticks": self.ticks,
            "streams_active": n_active,
            "frames_total": self.frames,
            "audio_seconds_total": self.frames * FRAME_BUDGET_S,
            "audio_seconds_per_s": self.frames * FRAME_BUDGET_S / elapsed,
            "tick_p50_ms": float(np.percentile(t, 50)) * 1e3,
            "tick_p99_ms": float(np.percentile(t, 99)) * 1e3,
            "underruns": self.underruns,
            **({"last_error": self.last_error} if self.last_error else {}),
        }


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self.t0
        return False
