#!/bin/bash
# Round-5 TPU batch D: consolidated post-outage queue, priority order.
# Waits for the tunnel to answer before starting.
set -u
LOG=${1:-/tmp/r5_tpu_d.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
# gate: wait (up to ~4 h) for the device to enumerate + run one op
for i in $(seq 1 120); do
  if timeout 420 python -c "import jax, jax.numpy as jnp; jnp.zeros(()) + 1; print('up')" >> "$LOG" 2>&1; then
    break
  fi
  echo "device gate: attempt $i failed $(date -u +%H:%M:%S)" >> "$LOG"
  sleep 60
done
run env BENCH_MODE=amg python -u bench.py
for bqbk in "512 1024" "2048 1024" "1024 2048" "512 2048"; do
  set -- $bqbk
  run env BENCH_MODE=3d BENCH_SKIP_768=1 MEDSAM2_KV_BQ=$1 MEDSAM2_KV_BK=$2 python -u bench.py
done
run env BENCH_MODE=3d_batch python -u bench.py
for bqbk in "512 512" "512 1024" "2048 1024" "2048 2048"; do
  set -- $bqbk
  run env BENCH_MODE=3d_batch MEDSAM2_KV_BQ=$1 MEDSAM2_KV_BK=$2 python -u bench.py
done
run python -u scripts/profile_glue.py 1024
run python -u scripts/profile_nuclei.py 4
run env MEDSAM2_NUCLEI_CHUNK=256 BENCH_MODE=nuclei python -u bench.py
run env BENCH_MODE=3d BENCH_OBJECTS=4 BENCH_SKIP_768=1 python -u bench.py
run env BENCH_MODE=3d python -u bench.py
run python -u scripts/profile_encoder_blocks.py 1024
echo "BATCH D DONE $(date -u)" >> "$LOG"
