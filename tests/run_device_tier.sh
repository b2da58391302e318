#!/bin/bash
# Forced device-path CI tier (VERDICT r2 item 5): the ENTIRE suite with the
# production accelerator defaults forced on the CPU backend
# (RENO_DEVICE_TRUNC=1 RENO_ASYNC_TRUNC=1).
#
# Each module runs in its own pytest process: one process accumulating the
# doubled XLA:CPU compilation load of the forced device paths can hit a
# flaky jaxlib CPU-compiler segfault (see conftest.py); process-per-module
# keeps every module's compilation count at its normal level.
set -u
cd "$(dirname "$0")/.."
export RENO_DEVICE_TRUNC=1
export RENO_ASYNC_TRUNC=1
rc=0
for mod in tests/test_*.py; do
  echo "=== $mod (device tier) ==="
  if ! timeout 3000 python -m pytest "$mod" -q -x --no-header 2>&1 | tail -3; then
    rc=1
  fi
  # pytest exit code is lost through the pipe; re-check with PIPESTATUS
  st=${PIPESTATUS[0]}
  if [ "$st" -ne 0 ]; then
    echo "FAILED: $mod (exit $st)"
    rc=1
  fi
done
exit $rc
