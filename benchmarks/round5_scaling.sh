#!/bin/bash
# Round-5 scaling battery (VERDICT r4 #2): full DMRG steady-state protocol at
# M=256/512/1024 plus the effective-H matvec microbench at each M, publishing
# s/sweep + MFU + HBM util.  The round-4 run left M=512/1024 DMRG null: the
# 50-minute cap expired inside the compile transient (no persistent-cache
# hits over the tunnel) and stderr was discarded so the cause was invisible.
# This version logs stderr per run and budgets 2h per DMRG point.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

out="scaling_r5.json"
log_dir="/tmp/scaling_r5_logs"
mkdir -p "$log_dir"
echo "{" > "$out"
for m in 256 512 1024; do
  extra_env=()
  if [ "$m" -ge 1024 ]; then
    # tier cold environments to host RAM; Davidson workspace budget keeps
    # the trial basis inside HBM (lib/solvers._budgeted_max_space)
    extra_env=(RENO_HOST_OFFLOAD=8)
  fi
  echo "=== M=$m dmrg ($(date -u +%H:%M:%S)) ==="
  dmrg=$(env RENO_BENCH_M=$m "${extra_env[@]}" timeout 7200 \
         python bench.py --sub dmrg 2>"$log_dir/dmrg_M$m.err" | tail -1)
  tail -3 "$log_dir/dmrg_M$m.err" || true
  echo "=== M=$m matvec ($(date -u +%H:%M:%S)) ==="
  matvec=$(env RENO_BENCH_M=$m timeout 1800 \
           python bench.py --sub matvec 2>"$log_dir/matvec_M$m.err" | tail -1)
  echo "  \"M$m\": {\"dmrg\": ${dmrg:-null}, \"matvec\": ${matvec:-null}}," >> "$out"
  echo "M=$m: dmrg=$dmrg matvec=$matvec"
done
echo "  \"done\": true" >> "$out"
echo "}" >> "$out"
echo "wrote $out"
