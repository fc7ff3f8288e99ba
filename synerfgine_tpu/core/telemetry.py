"""Telemetry: rolling-average timers, EMA meters, per-step metric logs.

Capability match for the reference's observability layer (SURVEY.md §5.1,
§5.5): `sng::Timer` labeled wall-clock records with 100-sample rolling
averages printed per label (synerfgine/common.cuh:156-203 and the
INIT_BENCHMARK/BENCHMARK macros), the `Ema` meters on the Testbed
(m_training_prep_ms / m_training_ms / m_render_ms / m_frame_ms,
testbed.h:1009-1013; Ema at common_host.h:62-107), and the structured
per-step metrics dict the TPU build logs instead of imgui dashboards.
"""
from __future__ import annotations

import collections
import json
import time
from typing import Callable


class Ema:
    """Time-based or iteration-based exponential moving average
    (common_host.h Ema semantics: half-life parameterized)."""

    def __init__(self, half_life: float = 50.0):
        self.half_life = half_life
        self.value = 0.0
        self._n = 0

    def update(self, x: float) -> float:
        alpha = 0.5 ** (1.0 / self.half_life)
        if self._n == 0:
            self.value = x
        else:
            self.value = alpha * self.value + (1 - alpha) * x
        self._n += 1
        return self.value


class Timer:
    """Labeled wall-clock timer with rolling averages; prints per-label
    means on `report()` (and optionally at destruction, like sng::Timer)."""

    def __init__(self, window: int = 100, report_at_exit: bool = False):
        self.records: dict[str, collections.deque] = {}
        self.window = window
        self._starts: dict[str, float] = {}
        self._report_at_exit = report_at_exit

    def start(self, label: str):
        self._starts[label] = time.perf_counter()

    def stop(self, label: str) -> float:
        dt = (time.perf_counter() - self._starts.pop(label)) * 1000.0
        self.records.setdefault(label, collections.deque(maxlen=self.window)
                                ).append(dt)
        return dt

    def measure(self, label: str, fn: Callable, *args, **kw):
        """BENCHMARK(label, fn) equivalent."""
        self.start(label)
        out = fn(*args, **kw)
        self.stop(label)
        return out

    def mean_ms(self, label: str) -> float:
        r = self.records.get(label)
        return sum(r) / len(r) if r else 0.0

    def report(self, print_fn=print):
        for label, r in sorted(self.records.items()):
            print_fn(f"AVE [{label}]: {sum(r)/len(r):.3f} ms "
                     f"({len(r)} samples)")

    def __del__(self):
        if getattr(self, "_report_at_exit", False) and self.records:
            try:
                self.report()
            except Exception:
                pass


class MetricsLogger:
    """Structured per-step metrics (loss, rays/batch, samples/ray, grid
    occupancy, rays/s) as JSON lines — the headless replacement for the
    imgui dashboards."""

    def __init__(self, path: str | None = None, print_every: int = 0):
        self.path = path
        self.print_every = print_every
        self._file = open(path, "a") if path else None
        self.history: list[dict] = []

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self.history.append(rec)
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        if self.print_every and step % self.print_every == 0:
            pairs = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in metrics.items())
            print(f"iteration={step} {pairs}")

    def close(self):
        if self._file:
            self._file.close()
