#!/bin/bash
# TPU work queue for when the tunnel (port 8083) returns. Run ONE at a time —
# the tunnel is single-client (CLAUDE.md hazards). Usage: bash benchmarks/tpu_queue.sh
set -e
cd "$(dirname "$0")/.."

if ! ss -tln | grep -q ':8083'; then
    echo "tunnel still down (port 8083 not listening)"; exit 1
fi

echo "=== 1/5: thesis workload parity, TPU arm (Parts A/A2/B/C) ==="
timeout 14400 python benchmarks/thesis_workload.py --only tpu

echo "=== 2/5: merge + report (cpu arm already cached in thesis_raw.json) ==="
timeout 600 python benchmarks/thesis_workload.py || true

echo "=== 3/5: bench headline (fit + acq + gower_lp_batch_s w/ jitter hint) ==="
timeout 3600 python bench.py

echo "=== 4/5: dense-N scaling rows (N=4096/8192/16384 + TFLOP/s) ==="
timeout 7200 python bench.py --scaling

echo "=== 5/5: per-op re-measure (optional, after code changes) ==="
timeout 2400 python benchmarks/prof_ops.py || true
