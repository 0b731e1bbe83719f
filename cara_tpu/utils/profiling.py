"""Profiling / tracing hooks (absent in the reference — SURVEY.md section 5).

* :class:`StepTimer` — wall-clock per-step timing and images/sec (the
  BASELINE.json north-star metric).
* :func:`trace` — ``jax.profiler`` trace context behind a flag, producing a
  TensorBoard-loadable xplane dump (``tools/trace_report.py`` summarizes it
  as per-op time tables without TensorBoard).
* :func:`annotate` — named trace spans for the step phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Tracks step wall time with warmup exclusion; reports images/sec."""

    def __init__(self, batch_size: int, warmup_steps: int = 2):
        self.batch_size = batch_size
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self):
        self._count = 0
        self._total = 0.0
        self._last: Optional[float] = None

    def __enter__(self):
        self._last = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup_steps:
            self._total += dt
        return False

    @property
    def steps_timed(self) -> int:
        return max(self._count - self.warmup_steps, 0)

    @property
    def mean_step_time(self) -> float:
        return self._total / self.steps_timed if self.steps_timed else 0.0

    @property
    def images_per_sec(self) -> float:
        t = self.mean_step_time
        return self.batch_size / t if t > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """``jax.profiler`` trace when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a trace (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


def memory_report(jitted, *args) -> Optional[dict]:
    """Device-memory footprint of a jitted function's compiled executable.

    Uses XLA's ``memory_analysis`` on the compiled artifact — arguments,
    outputs, temporaries (activations / workspace) and generated code, in
    MiB.  Lowering with the same arguments the caller is about to use hits
    the jit cache, so this costs no extra compile.  Returns ``None`` when
    the backend does not implement memory analysis.
    """
    try:
        mem = jitted.lower(*args).compile().memory_analysis()
    except Exception:
        return None
    if mem is None:
        return None
    out = {}
    for field in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
        val = getattr(mem, field, None)
        if val is not None:
            out[field.replace("_size_in_bytes", "_mib")] = round(
                val / 2**20, 2)
    if out:
        # Peak live HBM ~= arguments + outputs + temps + code, minus the
        # donated (aliased) buffers counted in both arguments and outputs.
        out["total_mib"] = round(
            out.get("argument_mib", 0.0) + out.get("output_mib", 0.0)
            + out.get("temp_mib", 0.0) + out.get("generated_code_mib", 0.0)
            - out.get("alias_mib", 0.0), 2)
    return out or None
