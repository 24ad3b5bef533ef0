#!/bin/bash
# Round-5 TPU batch C: flagship-shape kv block sweep, glue decomposition,
# clean nuclei profile + chunk sweep, final headline flagship bench.
set -u
LOG=${1:-/tmp/r5_tpu_c.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
# kv-cached-attention block sweep at the FLAGSHIP shape (@1024: q~4.2k,
# kv~28.7k, low-rank dv=64); default 1024/1024 is the bench baseline
for bqbk in "512 1024" "2048 1024" "1024 2048" "512 2048"; do
  set -- $bqbk
  run env BENCH_MODE=3d BENCH_SKIP_768=1 MEDSAM2_KV_BQ=$1 MEDSAM2_KV_BK=$2 python -u bench.py
done
run python -u scripts/profile_glue.py 1024
run python -u scripts/profile_nuclei.py 4
run env MEDSAM2_NUCLEI_CHUNK=256 BENCH_MODE=nuclei python -u bench.py
# multi-object scaling: 4 objects share one encoder pass; mem-attn/heads
# batch 4-wide (the reference's only trace is its multi-object DROP)
run env BENCH_MODE=3d BENCH_OBJECTS=4 BENCH_SKIP_768=1 python -u bench.py
# final headline (library defaults, best-of-5 reps, includes fps_768)
run env BENCH_MODE=3d python -u bench.py
echo "BATCH C DONE $(date -u)" >> "$LOG"
