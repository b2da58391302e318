"""1D Hubbard chain ground state via Jordan-Wigner QC-DMRG.

H = t sum_{i,s} (a_{i,s}^+ a_{i+1,s} + h.c.) + U sum_i n_{i,up} n_{i,down}

The Hubbard Hamiltonian is just a sparse quantum-chemistry integral set:
feed (h1, eri) through the same JW pipeline as ab-initio DMRG (``model.h_qc``)
and the two-component (N_alpha, N_beta) quantum numbers are conserved exactly
by the qn-blocked engine.  Counterpart of reference ``example/hubbard.py``.
"""

import logging

import numpy as np

from renormalizer_tpu import Model, Mpo, Mps, optimize_mps
from renormalizer_tpu.model.h_qc import int_to_h, qc_model
from renormalizer_tpu.utils import OptimizeConfig

logging.basicConfig(level=logging.INFO)

NSITES = 6
T = -1.0
U = 4.0

h1 = np.zeros((NSITES, NSITES))
for i in range(NSITES - 1):
    h1[i, i + 1] = h1[i + 1, i] = T
eri = np.zeros((NSITES,) * 4)
for i in range(NSITES):
    eri[i, i, i, i] = U

basis, ham_terms = qc_model(*int_to_h(h1, eri))
model = Model(basis, ham_terms)

M = 64
mps = Mps.random(model, [NSITES // 2, NSITES // 2], M, percent=1.0)
mps.optimize_config = OptimizeConfig(
    procedure=[[M, 0.5], [M, 0.4], [M, 0.3], [M, 0.2], [M, 0.1]] + [[M, 0]] * 8
)
mps.optimize_config.method = "2site"
energies, mps_opt = optimize_mps(mps, Mpo(model))
e = min(float(np.min(np.asarray(x))) for x in energies)
print(f"Hubbard N={NSITES} t={T} U={U} half-filling GS energy: {e:.8f}")
# exact diagonalization of the (N_a, N_b) = (3, 3) sector gives -3.09256532
assert abs(e - -3.09256532) < 1e-6
