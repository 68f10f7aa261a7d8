#!/bin/bash
# Round-5 post-canonical chip queue (STATUS.md): waits for the canonical
# pipeline supervisor to exit, then runs the remaining on-chip benches in
# priority order. Each item is SIGINT-bounded (never SIGKILL — axon claim
# wedge) and skipped if its artifact already exists, so the script is
# idempotent across relaunches. Honors the clean-preemption STOP sentinel
# (benchmarks/preempt.py): if the round-end driver claimed the chip, stop.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/results/queue_r5.log
STOP=benchmarks/results/canonical_r5.STOP
SUP_PID_FILE=/tmp/canonical_r5_supervisor.pid
PIPE_PID_FILE=/tmp/canonical_r5_python.pid

alive() { kill -0 "$1" 2>/dev/null; }

echo "queue: waiting for canonical run $(date -u)" >> "$LOG"
while :; do
  sup=$(cat "$SUP_PID_FILE" 2>/dev/null || echo "")
  pipe=$(cat "$PIPE_PID_FILE" 2>/dev/null || echo "")
  if { [ -z "$sup" ] || ! alive "$sup"; } && \
     { [ -z "$pipe" ] || ! alive "$pipe"; }; then
    break
  fi
  sleep 60
done
sleep 30   # tunnel claim settle
echo "queue: canonical done, starting $(date -u)" >> "$LOG"

run() {  # run <artifact> <timeout_s> <cmd...>
  local art=$1 t=$2; shift 2
  if [ -e "$STOP" ]; then echo "queue: STOP sentinel, exiting" >> "$LOG"; exit 5; fi
  if [ -s "$art" ]; then echo "queue: $art exists, skip" >> "$LOG"; return 0; fi
  echo "queue: START $* $(date -u)" >> "$LOG"
  timeout -s INT -k 120 "$t" "$@" >> "$LOG" 2>&1
  echo "queue: rc=$? $art $(date -u)" >> "$LOG"
}

R=benchmarks/results
run "$R/serving_bench_r5.json"      4200 python benchmarks/serving_bench.py --json "$R/serving_bench_r5.json"
finish_canonical() {
  # With every scan leaf cached in the resume jsonl a relaunch skips the
  # scan and runs only search/decompose/eval (~45-60 min); with a partial
  # cache it finishes the remaining leaves first. Unbounded: bench.py's
  # preemption protocol can always reclaim the chip at round end.
  if [ -e "$STOP" ]; then return 0; fi
  if python - <<'PY'
import json, sys
try:
    d = json.load(open("benchmarks/results/pipeline_bench_r5_full.json"))
    sys.exit(0 if d.get("run_kind") == "single run" else 1)
except Exception:
    sys.exit(1)
PY
  then return 0; fi
  echo "queue: canonical artifact partial — relaunching to finish $(date -u)" >> "$LOG"
  MAX_RSS_GB="${MAX_RSS_GB:-100}" DEADLINE_UTC="" CRASH_RETRIES=4 \
    bash benchmarks/run_canonical_r5.sh
  echo "queue: canonical finisher rc=$? $(date -u)" >> "$LOG"
}

# priority interleave: top bench first, then complete the canonical
# artifact, then the remaining benches — whatever the round-end cut hits,
# the most valuable artifacts are already on disk
finish_canonical
run "$R/attn_gqa_p1024_r5.json"     2400 python benchmarks/attn_micro_bench.py --geos gqa8 --contexts 4096 --page 1024 --json "$R/attn_gqa_p1024_r5.json"
run "$R/attn_gqa_p512_r5.json"      2400 python benchmarks/attn_micro_bench.py --geos gqa8 --contexts 4096 --page 512 --json "$R/attn_gqa_p512_r5.json"
run "$R/attn_micro_r5.json"         3600 python benchmarks/attn_micro_bench.py --json "$R/attn_micro_r5.json"
run "$R/model_decode_bench_r5.json" 3600 python benchmarks/model_decode_bench.py --json "$R/model_decode_bench_r5.json"
run "$R/kernel_bench_r5.json"       2400 python benchmarks/kernel_bench.py --json "$R/kernel_bench_r5.json"
echo "queue: all done $(date -u)" >> "$LOG"

echo "queue: fully done $(date -u)" >> "$LOG"
