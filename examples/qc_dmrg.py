"""Ab-initio quantum chemistry DMRG from an FCIDUMP file.

Run: python examples/qc_dmrg.py path/to/FCIDUMP n_spatial_orbs n_alpha n_beta
"""
import sys

import numpy as np

from renormalizer_tpu import Model, Mpo, Mps
from renormalizer_tpu.model.h_qc import int_to_h, qc_model, read_fcidump
from renormalizer_tpu.mps.gs import optimize_mps
from renormalizer_tpu.utils import OptimizeConfig

if len(sys.argv) >= 5:
    fname, norb, na, nb = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    h1e, h2e, nuc = read_fcidump(fname, norb)
else:
    # no FCIDUMP given: run a synthetic 3-orbital demo
    rng = np.random.default_rng(5)
    norb, na, nb, nuc = 3, 1, 1, 0.0
    h = rng.standard_normal((norb, norb))
    h = (h + h.T) / 2
    c = rng.standard_normal((4, norb, norb))
    c = (c + c.transpose(0, 2, 1)) / 2
    eri = np.einsum("mij,mkl->ijkl", c, c) * 0.2
    h1e, h2e = int_to_h(h, eri)
basis, ham_terms = qc_model(h1e, h2e)
model = Model(basis, ham_terms)

M = 50
mps = Mps.random(model, [na, nb], M, percent=1.0)
mps.optimize_config = OptimizeConfig(
    procedure=[[M, 0.4], [M, 0.2], [M, 0.1]] + [[M, 0]] * 5
)
mps.optimize_config.method = "2site"
energies, _ = optimize_mps(mps, Mpo(model))
print("E(DMRG) =", min(float(np.min(np.asarray(e))) for e in energies) + nuc)
