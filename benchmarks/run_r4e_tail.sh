#!/bin/bash
# Round-4 tail: after the phase-4 queue completes, if the round clock
# still allows (arg = hard stop epoch), re-run the model_decode bench so
# the committed "auto" rows reflect the r4c-data-driven selector change
# (GQA thin-saving latent-V demoted to dense, commit 5defcff). ~6 min
# warm. Skips itself if the remaining budget is under 9 minutes.
set -u
cd /root/repo
STOP=${1:?hard stop epoch}
log() { echo "=== [$(date +%H:%M:%S)] $*" | tee -a /tmp/r4logs/queue_e.log; }
while ! grep -q "QUEUE_D COMPLETE" /tmp/r4logs/queue_d.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$STOP" ]; then log "stop: queue_d still running at hard stop"; exit 0; fi
  sleep 30
done
REMAIN=$(( STOP - $(date +%s) ))
if [ "$REMAIN" -lt 540 ]; then log "skip model_decode_d: only ${REMAIN}s left"; exit 0; fi
log "START model_decode_d (${REMAIN}s budget)"
timeout -s INT -k 120 $(( REMAIN - 120 )) \
  python benchmarks/model_decode_bench.py --json benchmarks/results/model_decode_bench_r4d.json \
  >/tmp/r4logs/model_decode_d.log 2>&1
log "DONE model_decode_d rc=$?"
