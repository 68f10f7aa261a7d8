#!/bin/bash
# Canonical 32-layer x (32x2048) n=32 full-depth pipeline run with
# host-RSS process recycling (round 5, VERDICT #1).
#
# Why a supervisor: the axon PJRT tunnel retains host memory proportional
# to a process's lifetime device-buffer traffic (~1.8 GB per scanned leaf;
# the 07:14 UTC run was OOM-killed by the HOST kernel at 131 GB after 64
# of 225 leaves). utils/hostguard.py makes the scan exit rc=42 at
# --max_rss_gb after persisting per-leaf state; this loop relaunches until
# the pipeline completes. Never SIGKILL the python process (axon claim
# wedge) — DEADLINE_UTC (HH:MM, today) bounds each attempt with SIGINT so
# a partial artifact still lands.
set -u
cd "$(dirname "$0")/.."
RES=benchmarks/results/canonical_r5_resume.jsonl
LOG=benchmarks/results/pipeline_full_r5c.log
OUT=benchmarks/results/pipeline_bench_r5_full.json
DEADLINE="${DEADLINE_UTC:-}"
MAXRSS="${MAX_RSS_GB:-82}"

STOP=benchmarks/results/canonical_r5.STOP

for i in $(seq 1 60); do
  # clean-preemption sentinel (benchmarks/preempt.py): bench.py/entry()
  # create it before SIGINTing the pipeline — never relaunch into their
  # chip claim
  if [ -e "$STOP" ]; then
    echo "supervisor: STOP sentinel present, exiting" >> "$LOG"
    exit 5
  fi
  echo "supervisor: attempt $i starting $(date -u)" >> "$LOG"
  args=(benchmarks/pipeline_bench.py --layers 32 --n_calib 32 --seqlen 2048
        --host_master --eval_tokens 65536 --reps 1
        --resume "$RES" --max_rss_gb "$MAXRSS" --json "$OUT")
  if [ -n "$DEADLINE" ]; then
    now=$(date -u +%s)
    end=$(date -u -d "today $DEADLINE" +%s)
    rem=$(( end - now ))
    if [ "$rem" -le 180 ]; then
      echo "supervisor: deadline $DEADLINE reached, stopping" >> "$LOG"
      exit 3
    fi
    timeout -s INT -k 120 "$rem" python "${args[@]}" >> "$LOG" 2>&1
  else
    python "${args[@]}" >> "$LOG" 2>&1
  fi
  rc=$?
  echo "supervisor: attempt $i exited rc=$rc $(date -u)" >> "$LOG"
  if [ "$rc" -eq 42 ]; then
    sleep 5
    continue
  fi
  # rc=1 crashes are retried a bounded number of times: per-leaf resume
  # state is already on disk, and the 13:15 UTC take-2 crash (device HBM
  # OOM at a marginal leaf — now converted to rc=42 by the in-scan
  # recovery ladder) killed a 94-minute attempt that a relaunch would
  # have resumed in minutes. Anything repeatedly fatal still stops.
  if [ "$rc" -eq 1 ] && [ "${crashes:-0}" -lt "${CRASH_RETRIES:-2}" ]; then
    crashes=$(( ${crashes:-0} + 1 ))
    echo "supervisor: crash retry $crashes/${CRASH_RETRIES:-2}" >> "$LOG"
    sleep 10
    continue
  fi
  exit $rc
done
echo "supervisor: attempt cap reached" >> "$LOG"
exit 4
