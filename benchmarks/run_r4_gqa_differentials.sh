#!/bin/bash
# Round-4: production GQA differentials vs the reference oracle (VERDICT r3
# #3 second half). CPU-only (the oracle is torch); nice-d because this box
# has ONE core and the chip queue's host process must keep priority.
# KV mode runs at 8 layers (cost scales ~layers^2 on the 1-core oracle;
# the rank-accounting/KV-grid semantics under test are depth-independent).
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue_gqa.log
  nice -n 10 python "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue_gqa.log
}
run gqa_weight -m asvd4llm_tpu.tools.differential --preset production \
    --kv_heads 4 --param_ratio_target 0.85 \
    --out benchmarks/results/differential_production_gqa_r4.json
run gqa_kv -m asvd4llm_tpu.tools.differential --preset production \
    --kv_heads 4 --layers 8 --compress_kv_cache --kv_cache_ratio_target 0.6 \
    --out benchmarks/results/differential_production_gqa_kv_r4.json
echo "=== [$(date +%H:%M:%S)] QUEUE_GQA COMPLETE" | tee -a /tmp/r4logs/queue_gqa.log
