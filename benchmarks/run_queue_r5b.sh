#!/bin/bash
# Round-5 second-pass queue: waits for run_queue_r5.sh to exit, then
# retries any artifact the first pass failed to land (the 20:03 UTC
# serving_bench attempt died to RESOURCE_EXHAUSTED 34 s after the
# canonical pipeline's 13-GB-resident process exited — the axon tunnel
# claim had not fully released; the flat-dense baseline that OOMed is
# untouched by this round's serving changes). Same idempotent
# skip-if-exists semantics; SIGINT-bounded; honors the STOP sentinel.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/results/queue_r5b.log
STOP=benchmarks/results/canonical_r5.STOP

echo "queue2: waiting for first-pass queue $(date -u)" >> "$LOG"
while pgrep -x -f "bash benchmarks/run_queue_r5.sh" >/dev/null 2>&1; do
  sleep 60
done
sleep 120   # generous tunnel claim settle
echo "queue2: starting $(date -u)" >> "$LOG"

run() {
  local art=$1 t=$2; shift 2
  if [ -e "$STOP" ]; then echo "queue2: STOP sentinel, exiting" >> "$LOG"; exit 5; fi
  if [ -s "$art" ]; then echo "queue2: $art exists, skip" >> "$LOG"; return 0; fi
  echo "queue2: START $* $(date -u)" >> "$LOG"
  timeout -s INT -k 120 "$t" "$@" >> "$LOG" 2>&1
  echo "queue2: rc=$? $art $(date -u)" >> "$LOG"
  sleep 30
}

R=benchmarks/results
run "$R/serving_bench_r5.json"      4200 python benchmarks/serving_bench.py --json "$R/serving_bench_r5.json"
run "$R/attn_gqa_p1024_r5.json"     2400 python benchmarks/attn_micro_bench.py --geos gqa8 --contexts 4096 --page 1024 --json "$R/attn_gqa_p1024_r5.json"
run "$R/attn_gqa_p512_r5.json"      2400 python benchmarks/attn_micro_bench.py --geos gqa8 --contexts 4096 --page 512 --json "$R/attn_gqa_p512_r5.json"
run "$R/attn_micro_r5.json"         3600 python benchmarks/attn_micro_bench.py --json "$R/attn_micro_r5.json"
run "$R/model_decode_bench_r5.json" 3600 python benchmarks/model_decode_bench.py --json "$R/model_decode_bench_r5.json"
run "$R/kernel_bench_r5.json"       2400 python benchmarks/kernel_bench.py --json "$R/kernel_bench_r5.json"
echo "queue2: all done $(date -u)" >> "$LOG"
