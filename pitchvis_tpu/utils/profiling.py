"""Tracing / profiling / observability.

The reference surfaces runtime metrics in a debug UI: FPS
(FrameTimeDiagnosticsPlugin), audio latency and chunk size from the ring
buffer, VQT algorithmic delay, current smoothing horizon
(pitchvis_viewer/src/app/common.rs:148-334). The TPU equivalents:

* `StageTimer` — per-stage wall-clock timers with EMA'd rates (the FPS /
  latency overlay data source), cheap enough for production loops;
* `DebugReport` — one-call snapshot of pipeline health: stage timings,
  throughput, AGC gains, algorithmic delay, kernel stats;
* `trace()` — context manager around `jax.profiler.trace` for device-level
  traces viewable in TensorBoard/Perfetto;
* `annotate()` — `jax.profiler.TraceAnnotation` wrapper for named regions.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """EMA'd per-stage timings (seconds) + rates, frame-rate independent."""

    def __init__(self, horizon: float = 2.0):
        self.horizon = horizon
        self._ema: dict[str, float] = {}
        self._last: dict[str, float] = {}
        self._seen: dict[str, float] = {}  # wall time of the last observation
        self._gap_ema: dict[str, float] = {}  # EMA'd inter-observation gap
        self._count: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.observe(name, dt)

    def observe(self, name: str, dt: float) -> None:
        self._last[name] = dt
        self._count[name] += 1
        now = time.perf_counter()
        prev = self._ema.get(name)
        if prev is None:
            self._ema[name] = dt
        else:
            import math

            # the EMA timestep is the WALL time since this stage was last
            # observed, not the stage's own duration — using dt would make a
            # fast stage's EMA converge arbitrarily slowly (a 1 ms stage at
            # 60 fps would need ~33 s of wall time for a 2 s horizon)
            step = now - self._seen.get(name, now - dt)
            alpha = 1.0 - math.exp(-2.0 * max(step, 1e-9) / self.horizon)
            self._ema[name] = prev + alpha * (dt - prev)
            gap_prev = self._gap_ema.get(name, step)
            self._gap_ema[name] = gap_prev + alpha * (step - gap_prev)
        self._seen[name] = now

    def ema(self, name: str) -> float:
        return self._ema.get(name, 0.0)

    def last(self, name: str) -> float:
        return self._last.get(name, 0.0)

    def fps(self, name: str) -> float:
        """The OBSERVED invocation rate (1 / EMA'd gap between calls) — the
        number an FPS overlay means. A 1 ms stage called once per 16.7 ms
        frame reports 60, not its theoretical-max 1000 (that inverse-duration
        figure is still available via :meth:`max_fps`)."""
        g = self._gap_ema.get(name, 0.0)
        return 1.0 / g if g > 0 else 0.0

    def max_fps(self, name: str) -> float:
        """The stage's maximum achievable rate: 1 / EMA'd stage duration."""
        e = self.ema(name)
        return 1.0 / e if e > 0 else 0.0

    def report(self) -> dict:
        return {
            name: {
                "ema_ms": round(1000.0 * self._ema[name], 3),
                "last_ms": round(1000.0 * self._last.get(name, 0.0), 3),
                "count": self._count[name],
                "fps": round(self.fps(name), 1),
            }
            for name in self._ema
        }


#: Device-level profiler trace (view in TensorBoard) — jax.profiler.trace
#: is already the context manager this module used to reimplement.
trace = jax.profiler.trace


def annotate(name: str):
    """Named trace region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def debug_report(pipeline, timer: StageTimer | None = None) -> dict:
    """Pipeline health snapshot (the debug-overlay data of common.rs:148-334
    as a dict): algorithmic delay, kernel structure, stage timings."""
    from ..kernel.builder import kernel_stats

    report = {
        "vqt_delay_ms": round(1000.0 * pipeline.delay_secs, 2),
        "kernel": kernel_stats(pipeline.kernel),
        "n_buckets": pipeline.vqt_params.n_buckets,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }
    if timer is not None:
        report["stages"] = timer.report()
    return report
