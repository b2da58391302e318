#!/usr/bin/env python
"""Host-side cProfile of a steady-state TDVP-PS step (dispatch-bound regime).

Same protocol as profile_sweep_host.py: warm until no new jit traces, then
cProfile one step.  Diagnoses per-step dispatch regressions (round 5: the
bench measured 4.7 steps/s where round 4 measured 5.9-7.3)."""
import cProfile
import io
import os
import pstats
import sys
import time

sys.argv = [sys.argv[0]]
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import bench  # noqa: E402
from renormalizer_tpu.backend import backend  # noqa: E402

mps, mpo = bench._tdvp_model_mps("renormalizer_tpu")

stable = 0
for i in range(30):
    backend.sync()
    tr0 = bench.trace_count()
    t0 = time.time()
    mps = mps.evolve(mpo, bench.TDVP_DT)
    backend.sync()
    new_tr = bench.trace_count() - tr0
    print(f"warm step {i}: {time.time()-t0:.3f}s traces+{new_tr}",
          file=sys.stderr, flush=True)
    stable = stable + 1 if new_tr == 0 else 0
    if stable >= 3 and i >= 6:
        break

backend.sync()
prof = cProfile.Profile()
t0 = time.time()
prof.enable()
mps = mps.evolve(mpo, bench.TDVP_DT)
prof.disable()
backend.sync()
print(f"profiled step: {time.time()-t0:.3f}s", file=sys.stderr)
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
