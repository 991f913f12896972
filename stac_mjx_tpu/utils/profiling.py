"""Profiling & observability: phase timers and device traces as a subsystem.

The reference instruments with ad-hoc ``time.time()`` prints scattered
through its drivers (compute_stac.py:56,100-102,142,165,204,269;
main.py:71,135-137) and has no device-level profiling. Here both are
first-class:

- ``phase(name)``: context manager timing a pipeline phase; durations
  accumulate in a process-wide registry (``report()`` summarizes) and are
  logged through the package logger.
- ``device_trace(logdir)``: context manager around ``jax.profiler`` emitting
  an XPlane trace viewable in TensorBoard/XProf (no-op if unavailable).
- ``annotate(name)``: TraceAnnotation for labeling spans inside traced code.

Everything degrades to cheap no-ops so the pipeline never depends on the
profiler being usable on a given backend.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger("stac_mjx_tpu")

_phase_totals: dict[str, float] = defaultdict(float)
_phase_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str, log: bool = True):
    """Time a pipeline phase; accumulate into the process-wide registry."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _phase_totals[name] += dt
        _phase_counts[name] += 1
        if log:
            logger.info("phase %s: %.3fs", name, dt)


def report() -> dict[str, dict[str, float]]:
    """Snapshot of accumulated phase timings: {name: {total_s, count}}."""
    return {
        name: {"total_s": _phase_totals[name], "count": _phase_counts[name]}
        for name in _phase_totals
    }


def reset() -> None:
    """Clear the phase-timing registry."""
    _phase_totals.clear()
    _phase_counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Emit a jax.profiler trace for the enclosed block (TensorBoard/XProf).

    No-op when the profiler is unsupported on the active backend.
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.warning("device_trace unavailable: %s", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning("device_trace stop failed: %s", e)


def annotate(name: str):
    """Named span inside jitted/traced code paths (shows up in traces)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
