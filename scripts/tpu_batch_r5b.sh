#!/bin/bash
# Round-5 TPU batch B (reordered): fused-variant A/B decides the flagship
# attack first; clean-core AMG; fresh encoder block map; reduced kv sweep at
# the streaming shape (defaults are 1024/1024); 3d_batch with best blocks.
set -u
LOG=${1:-/tmp/r5_tpu_b.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
run python -u scripts/profile_fused_variants.py 1024
run env BENCH_MODE=amg python -u bench.py
run python -u scripts/profile_encoder_blocks.py 1024
for bqbk in "512 512" "512 1024" "1024 512" "2048 1024"; do
  set -- $bqbk
  run env BENCH_MODE=3d_batch MEDSAM2_KV_BQ=$1 MEDSAM2_KV_BK=$2 python -u bench.py
done
run env BENCH_MODE=3d_batch python -u bench.py
echo "BATCH B DONE $(date -u)" >> "$LOG"
