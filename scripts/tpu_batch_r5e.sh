#!/bin/bash
# Round-5 TPU batch E: 4-obj re-measure (post flash bh fix), glue decomposition
# re-run, 8-volume streaming scale; nuclei re-measures wait for pytest to end
# (host-inclusive timing needs the core).
set -u
LOG=${1:-/tmp/r5_tpu_e.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
run env BENCH_MODE=3d BENCH_OBJECTS=4 BENCH_SKIP_768=1 python -u bench.py
run python -u scripts/profile_glue.py 1024
run env BENCH_MODE=3d_batch BENCH_VOLUMES=8 python -u bench.py
while pgrep -x pytest >/dev/null 2>&1 || ps aux | grep -v grep | grep -q "[p]ytest tests"; do
  sleep 60
done
run env BENCH_MODE=nuclei python -u bench.py
run env MEDSAM2_NUCLEI_CHUNK=256 BENCH_MODE=nuclei python -u bench.py
run python -u scripts/profile_nuclei.py 4
echo "BATCH E DONE $(date -u)" >> "$LOG"
