#!/bin/bash
# Round-4 phase-2 chip queue: post-gc-fix re-measurements (the 06:xx r4
# artifacts predate commit f705fec's MHA group-chunk fix that they
# motivated), the serving q8/utilization upgrade, then the headline:
# the COMPLETE 32-layer 7B pipeline measured (host-master residency),
# canonical 32x2048 budget, cold AND steady (VERDICT r3 items #1/#2/#9).
# One long-lived runner, never killed (the round-3 axon wedge).
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue_b.log
  python "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue_b.log
}
run attn_micro_b   benchmarks/attn_micro_bench.py   --json benchmarks/results/attn_micro_r4b.json
run model_decode_b benchmarks/model_decode_bench.py --json benchmarks/results/model_decode_bench_r4b.json
run serving_b      benchmarks/serving_bench.py      --json benchmarks/results/serving_bench_r4b.json
run prefix_cache_b benchmarks/prefix_cache_bench.py --json benchmarks/results/prefix_cache_r4b.json
# VERDICT r3 #6: warm exact-vs-randomized timings with compile separated
run svd_b          benchmarks/svd_bench.py          --json benchmarks/results/svd_bench_r4.json
# full-depth memory probe + program pre-seed (n-independent SVD/search
# programs compile here; also the cheap canary for 32-layer HBM fit)
run pipeline_probe benchmarks/pipeline_bench.py --layers 32 --n_calib 2 --seqlen 2048 \
    --host_master --eval_tokens 8192 --json benchmarks/results/pipeline_bench_r4_probe.json
# the canonical run: 32 layers x (32 x 2048) calib budget, complete
# pipeline (stack/stats/scan/search+decompose/windowed eval), rep 1 =
# cold, rep 2 = steady
run pipeline_full benchmarks/pipeline_bench.py --layers 32 --n_calib 32 --seqlen 2048 \
    --host_master --eval_tokens 65536 --reps 2 --json benchmarks/results/pipeline_bench_r4_full.json
run bench_final bench.py
echo "=== [$(date +%H:%M:%S)] QUEUE_B COMPLETE" | tee -a /tmp/r4logs/queue_b.log
