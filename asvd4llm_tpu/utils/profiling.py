"""Tracing / profiling (SURVEY §5.1 — the reference has only tqdm bars and
one wall-clock print, ref binary_search.py:111,130-131).

Two tools:
- ``phase`` context manager: wall-clock per pipeline phase, accumulated in
  a process-global registry, dumped as JSON (structured superset of the
  reference's prints);
- ``device_trace``: wraps ``jax.profiler.trace`` for TensorBoard-readable
  device profiles of the hot phases.
"""

from __future__ import annotations

import contextlib
import json
import logging
import threading
import time

log = logging.getLogger(__name__)

_LOCK = threading.Lock()
_PHASES: dict[str, dict] = {}


@contextlib.contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            rec = _PHASES.setdefault(name, {"calls": 0, "total_s": 0.0})
            rec["calls"] += 1
            rec["total_s"] += dt
        log.info("[phase] %s: %.2fs", name, dt)


def phase_report() -> dict:
    with _LOCK:
        return {k: dict(v) for k, v in _PHASES.items()}


def dump_phase_report(path: str):
    with open(path, "w") as f:
        json.dump(phase_report(), f, indent=2)


def reset_phases():
    with _LOCK:
        _PHASES.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """TensorBoard trace of everything inside the context."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
