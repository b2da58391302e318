#!/usr/bin/env python
"""Host-side cProfile of a steady-state DMRG sweep (dispatch-bound regime).

The steady-state sweep at M=256 is 100%% dispatch time (drain 0.0 s), so the
wall time IS host python + dispatch; cProfile attribution of one sweep says
exactly what to fuse or cache next.  Run inside a TPU session.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.argv = [sys.argv[0]]
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import bench  # noqa: E402  (repo-root bench.py: model/config constants)
from renormalizer_tpu.backend import backend  # noqa: E402
from renormalizer_tpu.model import HolsteinModel, Mol, Phonon  # noqa: E402
from renormalizer_tpu.utils import (  # noqa: E402
    CompressConfig, CompressCriteria, Quantity)
from renormalizer_tpu.mps import Mps, Mpo  # noqa: E402
from renormalizer_tpu.mps.gs import single_sweep  # noqa: E402
from renormalizer_tpu.mps.lib import Environ  # noqa: E402

args = bench.build_model_args()
ph_list = [
    Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
    for w, d, n in zip(args["omegas_cm"], args["displacements_au"],
                       args["ph_levels"])
]
mol = Mol(Quantity(args["elocalex_ev"], "eV"), ph_list)
model = HolsteinModel([mol] * args["nmols"], Quantity(args["j_ev"], "eV"))
M = bench.M
mpo = Mpo(model)
mps = Mps.random(model, 1, M, percent=1.0)
mps.ensure_left_canonical()
environ = Environ(mps, mpo, "L")
opt_e_idx = None
mps.compress_config = CompressConfig(
    criteria=CompressCriteria.fixed, max_bonddim=M)

from renormalizer_tpu.mps import trunc_device  # noqa: E402


def plan_delta(before):
    return {k: trunc_device.PLAN_STATS[k] - before[k] for k in before}


# warm + STABILIZE exactly like bench.py: keep sweeping until a sweep adds
# no new jit trace anywhere — only then is the profile attributing the
# steady state rather than the compile/drift transient
stable = 0
for i, percent in enumerate([0.4, 0.2] + [0.0] * 38):
    backend.sync()
    before = dict(trunc_device.PLAN_STATS)
    tr0 = bench.trace_count()
    t0 = time.time()
    micro, _, mpo = single_sweep(mps, mpo, environ, None, percent, opt_e_idx)
    backend.sync()
    opt_e_idx = min(micro)[1]
    new_tr = bench.trace_count() - tr0
    print(f"warm sweep {i}: {time.time()-t0:.2f}s traces+{new_tr} "
          f"plan={plan_delta(before)}", file=sys.stderr, flush=True)
    stable = stable + 1 if new_tr == 0 else 0
    if stable >= 3 and i >= 8:
        break

backend.sync()
before = dict(trunc_device.PLAN_STATS)
prof = cProfile.Profile()
t0 = time.time()
prof.enable()
micro, _, mpo = single_sweep(mps, mpo, environ, None, 0.0, opt_e_idx)
prof.disable()
backend.sync()
print(f"profiled sweep: {time.time()-t0:.2f}s plan={plan_delta(before)}",
      file=sys.stderr)
print(f"sync sites (whole run): "
      f"{trunc_device.PLAN_STATS.get('sync_sites', [])[-12:]}",
      file=sys.stderr)
s = io.StringIO()
ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
ps.print_stats(45)
print(s.getvalue())
