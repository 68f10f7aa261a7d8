"""Clean preemption of a long-running canonical pipeline run.

The end-of-round driver runs ``bench.py`` (and compile-checks
``__graft_entry__.entry()``) on the real TPU. The axon backend's chip
claim is exclusive per process, so a still-running canonical pipeline
(benchmarks/run_canonical_r5.sh — designed to run for hours and resume
across process recycles) would starve those checks, and the round's
headline bench artifact would be lost (round 3 lost its bench to a wedged
claim). Teardown must be SIGINT — a SIGKILL'd process wedges the claim
host-side.

Protocol:
- pipeline_bench writes its PID to ``--pidfile`` at startup;
- the supervisor exits (instead of relaunching) when the STOP sentinel
  exists;
- :func:`preempt_canonical` — called by bench.py and entry() before they
  touch the chip — creates the sentinel, SIGINTs the live pipeline
  process (it emits its partial artifact on SIGINT: per-leaf resume state
  is already on disk, nothing is lost), and waits for the claim to drop.
"""
import os
import signal
import time

PIDFILE = "/tmp/canonical_r5_python.pid"
STOPFILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "canonical_r5.STOP")


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except (ProcessLookupError, PermissionError):
        return False
    try:
        # a zombie still answers kill(pid, 0) but holds no chip claim
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0] != "Z"
    except (OSError, IndexError):
        return False


def preempt_canonical(timeout_s: float = 300.0) -> bool:
    """Stop a live canonical pipeline run so this process can claim the
    chip. Returns True if one was stopped, False if none was running.
    No-op (False) when the pidfile is absent or stale."""
    try:
        with open(PIDFILE) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return False
    if not _alive(pid):
        return False
    # sentinel FIRST: the supervisor must not relaunch into our claim
    try:
        with open(STOPFILE, "w") as f:
            f.write(f"preempted by pid {os.getpid()} at {time.time()}\n")
    except OSError:
        pass
    print(f"preempt: SIGINT canonical pipeline pid {pid} "
          "(partial artifact lands on SIGINT; resume state is on disk)",
          flush=True)
    os.kill(pid, signal.SIGINT)
    t0 = time.time()
    while _alive(pid):
        if time.time() - t0 > timeout_s:
            print(f"preempt: pid {pid} still alive after {timeout_s:.0f}s — "
                  "proceeding anyway (NEVER SIGKILL: axon claim wedge)",
                  flush=True)
            return True
        time.sleep(2.0)
    # the tunnel releases the claim at teardown; small settle
    time.sleep(5.0)
    print(f"preempt: canonical pipeline stopped ({time.time() - t0:.0f}s)",
          flush=True)
    return True
