#!/usr/bin/env bash
# One-shot verification gauntlet — every gate the driver/judge checks,
# in cheapest-first order. ~25 min total at the default scales.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/6 pytest ==="
python -m pytest tests/ -q
echo "=== 2/6 plan audit (cartesian/BNLJ) ==="
python tools/plan_audit.py /root/testdata/sf0.01
echo "=== 3/6 window audit (global windows) ==="
python tools/window_audit.py /root/testdata/sf0.01
echo "=== 4/6 full oracle parity, sf0.01 ==="
python tools/parity.py /root/testdata/sf0.01
echo "=== 5/6 overflow subset, sf0.1 ==="
python tools/parity.py --subset overflow /root/testdata/sf0.1
echo "=== 6/6 bench probe ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_BENCH_RUNS=1 python bench.py
echo "ALL GATES GREEN"
