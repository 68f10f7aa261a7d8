#!/bin/bash
# Round-4 chip bench queue (VERDICT r3 item #1): run every round-3
# performance claim's bench on the real TPU, sequentially, in ONE
# long-lived runner that is never killed (the round-3 axon wedge was
# caused by killing a claimer mid-grant).
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue.log
  python "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue.log
}
run attn_micro    benchmarks/attn_micro_bench.py    --json benchmarks/results/attn_micro_r4.json
run model_decode  benchmarks/model_decode_bench.py  --json benchmarks/results/model_decode_bench_r4.json
run serving       benchmarks/serving_bench.py       --json benchmarks/results/serving_bench_r4.json
run prefix_cache  benchmarks/prefix_cache_bench.py  --json benchmarks/results/prefix_cache_r4.json
run kernel        benchmarks/kernel_bench.py        --json benchmarks/results/kernel_bench_r4.json
run svd           benchmarks/svd_bench.py           --json benchmarks/results/svd_bench_r4.json
echo "=== [$(date +%H:%M:%S)] QUEUE COMPLETE" | tee -a /tmp/r4logs/queue.log
