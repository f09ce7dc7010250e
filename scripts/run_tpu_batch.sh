#!/bin/sh
# Sequential TPU measurement batch (single CPU core: never run two python
# processes at once). Usage: sh scripts/run_tpu_batch.sh [outdir]
set -x
OUT=${1:-/tmp/tpu_batch}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

python scripts/probe_pse.py   > "$OUT/probe_pse.log"  2>&1
python scripts/probe_far2.py  > "$OUT/probe_far2.log" 2>&1
python scripts/probe_mc.py    > "$OUT/probe_mc.log"   2>&1
python bench.py               > "$OUT/bench.log"      2>&1
grep -h '^{' "$OUT"/*.log | tail -40
