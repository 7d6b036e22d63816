#!/bin/bash
# Generate demonstration datasets for every task, serially on the current
# backend (TPU by default). Logs to /tmp/gen_<task>.log.
#
#   bash tools/gen_all_demos.sh [out_dir]
set -u
OUT=${1:-data}
cd "$(dirname "$0")/.."

run() {
  task=$1; n=$2
  echo "=== $task (n=$n) $(date +%H:%M:%S)"
  timeout 2400 python -u tools/gen_demos.py --task "$task" --n "$n" \
      --out "$OUT" > "/tmp/gen_${task}.log" 2>&1
  rc=$?
  grep -v WARNING "/tmp/gen_${task}.log" | head -2
  tail -1 "/tmp/gen_${task}.log"
  echo "=== $task rc=$rc"
}

run avoiding 120
run pushing 120
run sorting_2 120
run aligning 120
run sorting_4 120
run sorting_6 120
run inserting 96
run stacking 96
echo "all done $(date +%H:%M:%S)"
