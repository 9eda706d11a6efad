#!/bin/bash
# TPU work queue for when the tunnel (port 8083) returns. Run ONE at a time —
# the tunnel is single-client (CLAUDE.md hazards). Usage: bash benchmarks/tpu_queue.sh
set -e
cd "$(dirname "$0")/.."

if ! ss -tln | grep -q ':8083'; then
    echo "tunnel still down (port 8083 not listening)"; exit 1
fi

echo "=== 1/3: thesis workload parity, TPU side (VERDICT r2 #2) ==="
timeout 10800 python benchmarks/thesis_workload.py --only tpu

echo "=== 2/3: merge + report ==="
timeout 600 python benchmarks/thesis_workload.py

echo "=== 3/3: bench headline ==="
timeout 3600 python bench.py
