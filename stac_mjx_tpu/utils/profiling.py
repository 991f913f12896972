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


def op_table(logdir: str, device_substr: str = "TPU", top: int = 12) -> dict:
    """Aggregate per-op device time from a ``device_trace`` output dir.

    Parses the Chrome-trace json the profiler wrote under ``logdir`` and
    sums durations per HLO op on devices whose process name contains
    ``device_substr`` (pass "CPU" to inspect host-backend traces). This is
    the GROUND TRUTH for attribution: timing isolated sub-programs
    misleads because XLA fuses them differently than the full program
    (bench.py's mfu leg measured an FK-only loop 3x slower than FK's real
    share of the solver it was meant to explain).

    Returns {"total_op_us", "ops": [{op, us, pct, category}, ...],
    "copy_formatting_pct"}; empty ops list if no trace/device matched.
    """
    import collections
    import glob
    import gzip
    import json as _json
    import os as _os

    paths = sorted(
        glob.glob(
            _os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
        )
    )
    if not paths:
        return {"total_op_us": 0.0, "ops": [], "copy_formatting_pct": 0.0}
    with gzip.open(paths[-1]) as fh:
        trace = _json.load(fh)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    durs: dict[str, float] = collections.Counter()
    cats: dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_substr not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or name.startswith("while"):
            continue  # program wrappers, not ops
        durs[name] += e.get("dur", 0)
        cats.setdefault(name, e.get("args", {}).get("hlo_category", ""))
    total = sum(durs.values())
    if not total:
        return {"total_op_us": 0.0, "ops": [], "copy_formatting_pct": 0.0}
    return {
        "total_op_us": round(total, 1),
        "ops": [
            {
                "op": name,
                "us": round(d, 1),
                "pct": round(100 * d / total, 1),
                "category": cats.get(name, ""),
            }
            for name, d in collections.Counter(durs).most_common(top)
        ],
        "copy_formatting_pct": round(
            100
            * sum(
                d
                for nm, d in durs.items()
                if cats.get(nm) == "data formatting"
            )
            / total,
            1,
        ),
    }
