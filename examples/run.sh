#!/bin/bash
# smoke-run every example (CI protocol mirrors the reference's example/run.sh:
# each script must start cleanly and run for at least TIMEOUT seconds or exit 0)
set -u
TIMEOUT=${TIMEOUT:-60}
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
export RENO_PLATFORM=${RENO_PLATFORM:-cpu}
fail=0
for f in examples/*.py; do
    echo "== $f"
    timeout "$TIMEOUT" python "$f" > /dev/null 2>&1
    code=$?
    if [ "$code" -ne 0 ] && [ "$code" -ne 124 ]; then
        echo "FAILED ($code): $f"
        fail=1
    fi
done
exit $fail
