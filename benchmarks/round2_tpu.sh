#!/bin/bash
# Round-2 TPU measurement battery (run when the tunnel is up):
#  1. headline bench (DMRG sweep + TDVP steps/s + matvec GFLOP/s)
#  2. phase breakdown of a steady-state sweep
#  3. device-truncation on/off A-B comparison
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

echo "=== bench.py (device trunc ON, async ON - defaults) ==="
timeout 2400 python bench.py

echo "=== phase breakdown ==="
timeout 1200 python benchmarks/profile_sweep.py 2>&1 | tail -10

echo "=== A/B: host-LAPACK truncation (round-1 path) ==="
RENO_DEVICE_TRUNC=0 timeout 2400 python bench.py 2>/dev/null | tail -1

echo "=== A/B: device trunc, sync selection (no async plans) ==="
RENO_ASYNC_TRUNC=0 timeout 2400 python bench.py 2>/dev/null | tail -1
