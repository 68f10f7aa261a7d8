"""Host-RAM guard + process-recycling signal for long on-chip runs.

Motivation (round 5): the axon PJRT tunnel retains a host-side footprint
roughly proportional to the device buffers a process allocates over its
lifetime, released only at process teardown — the canonical full-depth 7B
sensitivity scan leaked ~1.8 GB host RSS per scanned leaf and was
OOM-killed by the host kernel at 131 GB after 64 of 225 leaves (dmesg:
``Out of memory: Killed process ... anon-rss:130806640kB``; log
``benchmarks/results/pipeline_full_r5b.log``). Nothing in-process can
release that footprint, so long runs must (a) watch their own RSS and
(b) recycle the process at a safe boundary, resuming from on-disk state
(calib/sensitivity.py per-leaf resume + benchmarks/pipeline_bench.py
``--resume``/``--max_rss_gb`` + benchmarks/run_canonical_r5.sh).

``malloc_trim`` is called before every check: if the tunnel's buffers are
freed but glibc kept the arenas, trimming returns them to the OS and no
recycle is needed; if the retention is real, the check raises
:class:`HostBudgetExceeded` and the caller persists + exits for the
supervisor to restart it.
"""

from __future__ import annotations

import ctypes
import logging
import os

log = logging.getLogger(__name__)


class HostBudgetExceeded(RuntimeError):
    """Process host RSS crossed the recycle threshold.

    Raised by :func:`check` AFTER the caller has persisted its resumable
    state — catching it means "exit cleanly with the restart code, a
    supervisor will relaunch and resume".
    """


def rss_gb() -> float:
    """Resident set size of this process in GiB (Linux /proc)."""
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 2.0 ** 30


def malloc_trim() -> None:
    """Best-effort glibc malloc_trim(0): return freed arenas to the OS."""
    try:
        ctypes.CDLL("libc.so.6", use_errno=True).malloc_trim(0)
    except Exception:  # non-glibc / sandboxed — the check still reads RSS
        pass


# Live budget override: every recycle costs ~25 min on this environment
# (a 13 GB stack re-upload at tunnel speed plus per-process program
# loads), so an operator watching a multi-hour run may want to retune the
# budget without restarting the supervisor. The file is consulted on
# every check; a fresh attempt (new process) also picks it up.
BUDGET_OVERRIDE_FILE = "/tmp/asvd_max_rss_gb"


def _budget_override() -> float | None:
    try:
        with open(BUDGET_OVERRIDE_FILE) as f:
            return float(f.read().strip())
    except (OSError, ValueError):
        return None


def check(max_gb: float | None, where: str = "") -> float:
    """Trim, log, and enforce the host-RSS budget.

    Returns current RSS in GiB; raises :class:`HostBudgetExceeded` when a
    budget is set and exceeded. Call this only at points where all state
    needed to resume has already been persisted. A float in
    ``BUDGET_OVERRIDE_FILE`` replaces ``max_gb`` (live retuning of a
    running scan — but only when a budget was set at all: an override
    never turns guarding ON for unbudgeted runs)."""
    malloc_trim()
    if max_gb is not None:
        ov = _budget_override()
        if ov is not None:
            max_gb = ov
    r = rss_gb()
    if max_gb is not None and r > max_gb:
        log.warning("host RSS %.1f GB > budget %.1f GB after %s — "
                    "requesting process recycle", r, max_gb, where)
        raise HostBudgetExceeded(
            f"host RSS {r:.1f} GB > budget {max_gb:.1f} GB after {where}")
    return r
