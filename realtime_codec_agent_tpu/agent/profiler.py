"""Realtime-factor profilers for the duplex pipeline segments.

Rebuild of the reference profiling subsystem (realtime_agent_profiler.py:7-115):
context managers around each pipeline segment record realtime factor
(chunk_secs / elapsed) aggregated per report interval; a matplotlib plot with
the 1.0x threshold line serves as the benchmark artifact (cli_benchmark.py:74-81).
``jax.profiler`` trace capture can be layered on via ``trace_dir``.
"""
from __future__ import annotations

import time
from typing import List, Optional, Tuple

import numpy as np

from .config import RealtimeAgentConfig


class RealtimeAgentProfiler:
    def __init__(self, config: RealtimeAgentConfig):
        self.config = config
        self.reset()

    def reset(self) -> None:
        self.report_chunk_count = 0
        self.realtime_factor_sum = 0.0
        self.realtime_factor_values: List[float] = []
        self._chunk_start: Optional[float] = None

    def log_chunk_start(self) -> None:
        if not self.config.run_profilers:
            return
        self._chunk_start = time.perf_counter()

    def log_chunk_end(self) -> None:
        if not self.config.run_profilers:
            return
        if self._chunk_start is None:
            raise ValueError("log_chunk_start() must be called before log_chunk_end().")
        elapsed = time.perf_counter() - self._chunk_start
        self.realtime_factor_sum += self.config.chunk_size_secs / (elapsed + 1e-8)
        self.report_chunk_count += 1
        self._chunk_start = None
        if self.report_chunk_count * self.config.chunk_size_secs >= self.config.profiler_report_interval_secs:
            self.realtime_factor_values.append(self.realtime_factor_sum / self.report_chunk_count)
            self.realtime_factor_sum = 0.0
            self.report_chunk_count = 0

    def __enter__(self):
        self.log_chunk_start()
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.log_chunk_end()


SEGMENTS = (
    "total",
    "tokenize",
    "detokenize",
    "audio_tokenize",
    "audio_detokenize",
    "lm",
)


class RealtimeAgentProfilerCollection:
    """One profiler per pipeline segment (reference realtime_agent_profiler.py:47-55),
    plus optional jax.profiler trace capture for TPU-level inspection."""

    def __init__(self, config: RealtimeAgentConfig, trace_dir: Optional[str] = None):
        self.config = config
        self.trace_dir = trace_dir
        self._tracing = False
        for seg in SEGMENTS:
            setattr(self, f"{seg}_profiler", RealtimeAgentProfiler(config))

    def reset(self) -> None:
        for seg in SEGMENTS:
            getattr(self, f"{seg}_profiler").reset()

    # -- device-level tracing ------------------------------------------------
    def start_device_trace(self) -> None:
        if self.trace_dir and not self._tracing:
            import jax

            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True

    def stop_device_trace(self) -> None:
        if self._tracing:
            import jax

            jax.profiler.stop_trace()
            self._tracing = False

    # -- plotting ------------------------------------------------------------
    def build_plot(self, ylim: Tuple[float, float] = (0.5, 3.0)):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        interval = self.config.profiler_report_interval_secs
        n = len(self.total_profiler.realtime_factor_values)
        x = np.arange(interval, interval * (n + 1), interval)
        fig, ax = plt.subplots(figsize=(14, 4))
        for i, seg in enumerate(SEGMENTS):
            vals = getattr(self, f"{seg}_profiler").realtime_factor_values
            if not vals:
                continue
            color = f"C{i}"
            ax.plot(x[: len(vals)], vals, label=seg, color=color)
            ax.axhline(
                y=float(np.median(vals)),
                xmin=0.05,
                xmax=0.95,
                color=color,
                linestyle="--",
                linewidth=1.5,
                label=f"{seg} (median)",
            )
        ax.axhline(
            y=1.0, xmin=0.05, xmax=0.95, color="orange", linestyle="--", linewidth=2.5,
            label="threshold",
        )
        ax.set_title("Realtime Factor Profile")
        ax.set_xlabel("Time (seconds)")
        ax.set_ylabel("Realtime factor")
        ax.set_ylim(*ylim)
        ax.grid(True)
        fig.legend(loc="outside center right")
        return fig
