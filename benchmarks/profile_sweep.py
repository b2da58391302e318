#!/usr/bin/env python
"""Break down one steady-state DMRG sweep into phases (not a test; a tool).

Phases per 2-site update:
  env      - GetLR environment extension
  setup    - qn mask construction
  davidson - fused device eigensolve (incl. dispatch + wait)
  fetch    - device->host transfer of cstruct inside svd_qn
  lapack   - host per-sector SVD + scatter
  select   - select_basis gather + write-back rotations (device)
"""
import json
import time
import numpy as np

M = 256
NMOLS = 6
PH_LEVELS = [6, 6]

from renormalizer_tpu.backend import backend
from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
from renormalizer_tpu.utils import Quantity, CompressConfig, CompressCriteria
from renormalizer_tpu.mps import Mps, Mpo
from renormalizer_tpu.mps import svd_qn as svd_qn_mod
from renormalizer_tpu.mps.gs import single_sweep
from renormalizer_tpu.mps.lib import Environ
import renormalizer_tpu.mps.gs as gs_mod
import renormalizer_tpu.mps.mp as mp_mod

TIMES = {}


def record(key, dt):
    TIMES[key] = TIMES.get(key, 0.0) + dt


# --- instrument svd_qn: fetch vs lapack ---
_orig_svd_qn = svd_qn_mod.svd_qn


def timed_svd_qn(coef_array, qnbigl, qnbigr, qntot, QR=False, system=None, full_matrices=True):
    t0 = time.perf_counter()
    mat = np.asarray(coef_array)
    t1 = time.perf_counter()
    record("fetch", t1 - t0)
    record("fetch_bytes", mat.nbytes / (1 << 20))
    out = _orig_svd_qn(mat, qnbigl, qnbigr, qntot, QR=QR, system=system, full_matrices=full_matrices)
    record("lapack", time.perf_counter() - t1)
    return out


svd_qn_mod.svd_qn = timed_svd_qn
mp_mod.svd_qn.svd_qn = timed_svd_qn

# --- instrument eigh_iterative (davidson) ---
_orig_eigh_iter = gs_mod.eigh_iterative


def timed_eigh_iterative(*args, **kwargs):
    t0 = time.perf_counter()
    e, c = _orig_eigh_iter(*args, **kwargs)
    if hasattr(c, "block_until_ready"):
        c.block_until_ready()
    record("davidson", time.perf_counter() - t0)
    return e, c


gs_mod.eigh_iterative = timed_eigh_iterative

# --- instrument _update_mps minus svd (select+rotate) ---
_orig_update = mp_mod.MatrixProduct._update_mps


def timed_update(self, cstruct, cidx, qnbigl, qnbigr, percent=0):
    t0 = time.perf_counter()
    out = _orig_update(self, cstruct, cidx, qnbigl, qnbigr, percent)
    backend.sync()
    record("update_total", time.perf_counter() - t0)
    return out


mp_mod.MatrixProduct._update_mps = timed_update

# --- instrument env GetLR ---
_orig_getlr = Environ.GetLR


def timed_getlr(self, *args, **kwargs):
    t0 = time.perf_counter()
    out = _orig_getlr(self, *args, **kwargs)
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    record("env", time.perf_counter() - t0)
    return out


Environ.GetLR = timed_getlr


def main():
    ph_list = [
        Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
        for w, d, n in zip([106.51, 1555.55], [30.1370, 8.7729], PH_LEVELS)
    ]
    mol = Mol(Quantity(2.67, "eV"), ph_list)
    model = HolsteinModel([mol] * NMOLS, Quantity(-0.1, "eV"))
    mpo = Mpo(model)
    mps = Mps.random(model, 1, M, percent=1.0)
    mps.ensure_left_canonical()
    environ = Environ(mps, mpo, "L")
    sweeps = [[M, 0.4], [M, 0.2], [M, 0], [M, 0], [M, 0]]
    opt_e_idx = None
    for isweep, (m, percent) in enumerate(sweeps):
        mps.compress_config = CompressConfig(criteria=CompressCriteria.fixed, max_bonddim=m)
        if isweep == len(sweeps) - 1:
            TIMES.clear()  # measure only the last (steady-state) sweep
        backend.sync()
        t0 = time.time()
        micro, _, mpo2 = single_sweep(mps, mpo, environ, None, percent, opt_e_idx)
        backend.sync()
        dt = time.time() - t0
        opt_e = min(micro)
        opt_e_idx = opt_e[1]
        print(f"# sweep {isweep} percent={percent}: {dt:.2f}s e={opt_e[0]:.6f}")
    total = sum(v for k, v in TIMES.items() if k != "fetch_bytes")
    TIMES["accounted"] = total
    print(json.dumps({k: round(v, 3) for k, v in TIMES.items()}, indent=1))


if __name__ == "__main__":
    main()
