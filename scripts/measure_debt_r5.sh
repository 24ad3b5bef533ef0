#!/bin/bash
# Round-5 measurement debt (VERDICT r4 task 2): run each unmeasured/stale
# bench mode on the real TPU with library defaults, logging to /tmp/r5_debt.log.
set -u
LOG=${1:-/tmp/r5_debt.log}
cd /root/repo
run() {
  echo "=== $* ($(date -u +%H:%M:%S)) ===" >> "$LOG"
  timeout 3600 env "$@" python -u bench.py >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
}
: > "$LOG"
# 1. nuclei e2e (never recorded)
run BENCH_MODE=nuclei
# 2. train_3d @1024 with the encoder layout wins (stale 0.1516)
run BENCH_MODE=train_3d BENCH_IMAGE_SIZE=1024 BENCH_FRAMES=4 BENCH_OBJECTS=1
# 3. AMG e2e on a clean tunnel (target >= r2's 3481 cand/s)
run BENCH_MODE=amg
# 4. multi-object flagship (stale r2 59.3 fps @1024 2obj)
run BENCH_MODE=3d BENCH_OBJECTS=2 BENCH_SKIP_768=1
echo "ALL DONE $(date -u)" >> "$LOG"
