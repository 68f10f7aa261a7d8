#!/bin/bash
# Round-4 phase-4 chip queue. The r4b serving/attention artifacts predate
# two kernel commits that target exactly their weak spots:
#   - dbd2439 block-diagonal folded attention dots (the MHA paged 9-43%
#     regression the r4b suite exposed)
#   - 0fde930 paged-kernel trailing-page clamp (~half of page reads were
#     scratch-page DMAs on the serving mix) + pool donation
# So: wait for the in-flight full-depth probe to release the chip, then
# re-measure attention/decode/serving (r4c), then run the canonical
# 32-layer pipeline bounded by a DEADLINE — the round clock must never
# SIGKILL a process holding the axon claim (that wedged round 3's bench),
# so pipeline_full gets `timeout -s INT` (KeyboardInterrupt exits clean;
# proven on this chip) sized to leave room for bench.py, and the
# incremental per-rep emit lands the cold rep regardless.
# Usage: run_r4d_queue.sh [probe_pid] [deadline_epoch_for_pipeline_full]
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
if [ -n "${1:-}" ]; then
  echo "=== [$(date +%H:%M:%S)] WAITING on probe pid $1" | tee -a /tmp/r4logs/queue_d.log
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  echo "=== [$(date +%H:%M:%S)] probe exited" | tee -a /tmp/r4logs/queue_d.log
fi
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue_d.log
  "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue_d.log
}
run attn_micro_c   python benchmarks/attn_micro_bench.py   --json benchmarks/results/attn_micro_r4c.json
run serving_c      python benchmarks/serving_bench.py      --json benchmarks/results/serving_bench_r4c.json
run model_decode_c python benchmarks/model_decode_bench.py --json benchmarks/results/model_decode_bench_r4c.json
DEADLINE=${2:-0}
NOW=$(date +%s)
BUDGET=$(( DEADLINE - NOW ))
if [ "$BUDGET" -lt 600 ]; then BUDGET=600; fi
echo "=== [$(date +%H:%M:%S)] pipeline_full budget ${BUDGET}s" | tee -a /tmp/r4logs/queue_d.log
run pipeline_full timeout -s INT -k 120 "$BUDGET" \
    python benchmarks/pipeline_bench.py --layers 32 --n_calib 32 --seqlen 2048 \
    --host_master --eval_tokens 65536 --reps 2 --json benchmarks/results/pipeline_bench_r4_full.json
run bench_final python bench.py
echo "=== [$(date +%H:%M:%S)] QUEUE_D COMPLETE" | tee -a /tmp/r4logs/queue_d.log
