#!/bin/bash
# Round-4 scaling battery (VERDICT r3 item 3): the M=256 sweep is
# latency-bound (MFU 2.1%); measure the DMRG sweep + effective-H matvec at
# M=512 and M=1024 where the MXU should start to dominate, and publish
# s/sweep + MFU at each M.  Run when the tunnel is up.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

out="scaling_r4.json"
echo "{" > "$out"
for m in 256 512 1024; do
  echo "=== M=$m dmrg ==="
  dmrg=$(RENO_BENCH_M=$m timeout 3000 python bench.py --sub dmrg 2>/dev/null | tail -1)
  echo "=== M=$m matvec ==="
  matvec=$(RENO_BENCH_M=$m timeout 1200 python bench.py --sub matvec 2>/dev/null | tail -1)
  echo "  \"M$m\": {\"dmrg\": ${dmrg:-null}, \"matvec\": ${matvec:-null}}," >> "$out"
  echo "M=$m: dmrg=$dmrg matvec=$matvec"
done
echo "  \"done\": true" >> "$out"
echo "}" >> "$out"
echo "wrote $out"
