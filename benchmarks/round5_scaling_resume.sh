#!/bin/bash
# Resume of the round-5 battery for M=512/1024 with the persistent compile
# cache ACTIVE (bench.py now enables it via jax.config.update — the env var
# silently did nothing on jax 0.9, which is why every prior M>=512 attempt
# burned its 1-2h budget inside the compile transient and died without a
# number).  With the cache on, a timed-out attempt persists its compiles,
# so the retry resumes where it stopped instead of starting over.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
log_dir="/tmp/scaling_r5_logs"
mkdir -p "$log_dir"
for m in 512 1024; do
  extra_env=()
  if [ "$m" -ge 1024 ]; then
    extra_env=(RENO_HOST_OFFLOAD=8)
  fi
  for attempt in 1 2; do
    echo "=== M=$m dmrg attempt $attempt ($(date -u +%H:%M:%S)) ==="
    dmrg=$(env RENO_BENCH_M=$m "${extra_env[@]}" timeout 5400 \
           python bench.py --sub dmrg 2>"$log_dir/dmrg_M${m}_a$attempt.err" | tail -1)
    tail -2 "$log_dir/dmrg_M${m}_a$attempt.err" || true
    [ -n "$dmrg" ] && break
  done
  echo "=== M=$m matvec ($(date -u +%H:%M:%S)) ==="
  matvec=$(env RENO_BENCH_M=$m timeout 1800 \
           python bench.py --sub matvec 2>"$log_dir/matvec_M$m.err" | tail -1)
  echo "M$m dmrg: ${dmrg:-null}"
  echo "M$m matvec: ${matvec:-null}"
  python - "$m" "${dmrg:-null}" "${matvec:-null}" <<'PYEOF'
import json, sys
m, dmrg, matvec = sys.argv[1], sys.argv[2], sys.argv[3]
try:
    data = json.load(open("scaling_r5_results.json"))
except Exception:
    data = {}
data[f"M{m}"] = {"dmrg": json.loads(dmrg) if dmrg != "null" else None,
                 "matvec": json.loads(matvec) if matvec != "null" else None}
json.dump(data, open("scaling_r5_results.json", "w"), indent=1)
PYEOF
done
echo done
