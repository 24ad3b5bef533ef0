#!/bin/bash
# Round-5 TPU batch A: fused-MLP A/B, nuclei re-measure (filtering=False),
# kv block sweep at streaming shapes, fresh encoder block map.
set -u
LOG=${1:-/tmp/r5_tpu_a.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
# host-inclusive benches need the core to themselves: wait for any running
# pytest suite to finish first
while pgrep -x pytest >/dev/null 2>&1 || ps aux | grep -v grep | grep -q "[p]ytest tests"; do
  sleep 60
done
run python -u scripts/profile_fused_mlp.py 1024
run env BENCH_MODE=nuclei python -u bench.py
# kv block sweep at the streaming shape (@512 the kv seq is ~7.2k; q=1024)
for bq in 512 1024 2048; do
  for bk in 512 1024 2048; do
    run env BENCH_MODE=3d_batch MEDSAM2_KV_BQ=$bq MEDSAM2_KV_BK=$bk python -u bench.py
  done
done
run python -u scripts/profile_encoder_blocks.py 1024
# clean-core re-runs of the host-inclusive modes the suite contended with
run env BENCH_MODE=amg python -u bench.py
run env BENCH_MODE=3d BENCH_OBJECTS=2 BENCH_SKIP_768=1 python -u bench.py
echo "BATCH A DONE $(date -u)" >> "$LOG"
