#!/bin/bash
# Round-4 phase-4 chip queue. The r4b serving/attention artifacts predate
# two kernel commits that target exactly their weak spots:
#   - dbd2439 block-diagonal folded attention dots (the MHA paged 9-43%
#     regression the r4b suite exposed)
#   - 0fde930 paged-kernel trailing-page clamp (~half of page reads were
#     scratch-page DMAs on the serving mix) + pool donation
# So: wait for the in-flight full-depth probe to release the chip, then
# re-measure attention/decode/serving (r4c), then run the canonical
# 32-layer pipeline (cold + steady), then bench.py.
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
# wait for the orphaned probe (benchmarks/pipeline_bench.py --layers 32
# --n_calib 2) to exit; its pid is passed as $1
if [ -n "${1:-}" ]; then
  echo "=== [$(date +%H:%M:%S)] WAITING on probe pid $1" | tee -a /tmp/r4logs/queue_d.log
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  echo "=== [$(date +%H:%M:%S)] probe exited" | tee -a /tmp/r4logs/queue_d.log
fi
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue_d.log
  python "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue_d.log
}
run attn_micro_c   benchmarks/attn_micro_bench.py   --json benchmarks/results/attn_micro_r4c.json
run serving_c      benchmarks/serving_bench.py      --json benchmarks/results/serving_bench_r4c.json
run model_decode_c benchmarks/model_decode_bench.py --json benchmarks/results/model_decode_bench_r4c.json
run pipeline_full benchmarks/pipeline_bench.py --layers 32 --n_calib 32 --seqlen 2048 \
    --host_master --eval_tokens 65536 --reps 2 --json benchmarks/results/pipeline_bench_r4_full.json
run bench_final bench.py
echo "=== [$(date +%H:%M:%S)] QUEUE_D COMPLETE" | tee -a /tmp/r4logs/queue_d.log
