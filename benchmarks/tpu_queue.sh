#!/bin/bash
# TPU work queue for when the tunnel (port 8083) returns. Run ONE at a time —
# the tunnel is single-client (CLAUDE.md hazards). Usage: bash benchmarks/tpu_queue.sh
set -e
cd "$(dirname "$0")/.."

if ! ss -tln | grep -q ':8083'; then
    echo "tunnel still down (port 8083 not listening)"; exit 1
fi

echo "=== 1/4: thesis workload parity, TPU arm (Parts A/A2/B/C) ==="
timeout 10800 python benchmarks/thesis_workload.py --only tpu

echo "=== 2/4: merge + report (needs the CPU arm re-run for A2/C; do that"
echo "         separately on CPU while the tunnel work proceeds) ==="
timeout 600 python benchmarks/thesis_workload.py || true

echo "=== 3/4: bench headline (fit + acq + gower_lp_batch_s) ==="
timeout 3600 python bench.py

echo "=== 4/4: dense-N scaling rows (N=4096/8192/16384 + TFLOP/s) ==="
timeout 7200 python bench.py --scaling
