#!/bin/bash
# Round-4 phase-3 chip queue: the remaining headline — the COMPLETE
# 32-layer 7B pipeline measured on one v5e chip (host-master residency),
# canonical 32x2048 budget, cold AND steady (VERDICT r3 items #2/#9).
# Probe first (cheap canary: HBM fit + program pre-seed), then the
# canonical run. One long-lived runner, never killed.
set -u
cd /root/repo
mkdir -p benchmarks/results /tmp/r4logs
run() {
  name=$1; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r4logs/queue_c.log
  python "$@" >/tmp/r4logs/$name.log 2>&1
  rc=$?
  echo "=== [$(date +%H:%M:%S)] DONE  $name rc=$rc" | tee -a /tmp/r4logs/queue_c.log
}
run pipeline_probe benchmarks/pipeline_bench.py --layers 32 --n_calib 2 --seqlen 2048 \
    --host_master --eval_tokens 8192 --json benchmarks/results/pipeline_bench_r4_probe.json
run pipeline_full benchmarks/pipeline_bench.py --layers 32 --n_calib 32 --seqlen 2048 \
    --host_master --eval_tokens 65536 --reps 2 --json benchmarks/results/pipeline_bench_r4_full.json
echo "=== [$(date +%H:%M:%S)] QUEUE_C COMPLETE" | tee -a /tmp/r4logs/queue_c.log
