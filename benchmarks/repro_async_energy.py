#!/usr/bin/env python
"""Reproduce/monitor the round-2 async-path energy corruption seen in
profile_sweep (sweep 4 of the M=256 bench printed e=-12.59 on TPU).

Runs the bench model with RENO_DEVICE_TRUNC=1 RENO_ASYNC_TRUNC=1 for 6
sweeps and prints per-sweep energies; any energy far from the converged
0.11504 after the first percent=0 sweep is a failure."""
import os
import sys
import time

os.environ.setdefault("RENO_DEVICE_TRUNC", "1")
os.environ.setdefault("RENO_ASYNC_TRUNC", "1")

import numpy as np

M = int(os.environ.get("REPRO_M", "256"))
NSWEEP0 = 4

from renormalizer_tpu.backend import backend
from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
from renormalizer_tpu.utils import Quantity, CompressConfig, CompressCriteria
from renormalizer_tpu.mps import Mps, Mpo
from renormalizer_tpu.mps.gs import single_sweep
from renormalizer_tpu.mps.lib import Environ

ph_list = [
    Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
    for w, d, n in zip([106.51, 1555.55], [30.1370, 8.7729], [6, 6])
]
mol = Mol(Quantity(2.67, "eV"), ph_list)
model = HolsteinModel([mol] * 6, Quantity(-0.1, "eV"))
mpo = Mpo(model)
mps = Mps.random(model, 1, M, percent=1.0)
mps.optimize_config.procedure = [[M, 0.4], [M, 0.2]] + [[M, 0]] * NSWEEP0
mps.ensure_left_canonical()
environ = Environ(mps, mpo, "L")
opt_e_idx = None
ok = True
for isweep, (m, percent) in enumerate(mps.optimize_config.procedure):
    mps.compress_config = CompressConfig(
        criteria=CompressCriteria.fixed, max_bonddim=m)
    backend.sync()
    t0 = time.time()
    micro, _, mpo = single_sweep(mps, mpo, environ, None, percent, opt_e_idx)
    backend.sync()
    opt_e = min(micro)
    opt_e_idx = opt_e[1]
    print(f"sweep {isweep} percent={percent}: {time.time()-t0:.2f}s "
          f"e={opt_e[0]:.6f}", flush=True)
    if percent == 0 and abs(opt_e[0] - 0.11504) > 0.01:
        ok = False
print("OK" if ok else "ENERGY CORRUPTION", flush=True)
sys.exit(0 if ok else 1)
