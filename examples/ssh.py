"""Optical SSH (Su-Schrieffer-Heeger) polaron ground state.

H  = t sum_i (a_i^+ a_{i+1} + h.c.)
   + w0 sum_i b_i^+ b_i
   + g sum_i (a_{i+1}^+ a_i + a_i^+ a_{i+1}) (X_{i+1} - X_i),   X = b^+ + b

Phonons couple to the BOND (hopping), not the site energy — a different
e-ph structure from Holstein that exercises multi-site Op products.
Counterpart of reference ``example/ssh.py``.
"""

import logging

import numpy as np

from renormalizer_tpu import Model, Mpo, Mps, Op, optimize_mps
from renormalizer_tpu.model import BasisSHO, BasisSimpleElectron
from renormalizer_tpu.utils import OptimizeConfig

logging.basicConfig(level=logging.INFO)

NSITES = 6
T_HOP = -1.0
W0 = 0.5
G = 0.3
NPH = 6  # phonon levels

basis = []
terms = []
for i in range(NSITES):
    basis.append(BasisSimpleElectron(("e", i)))
    basis.append(BasisSHO(("ph", i), W0, NPH))
    terms.append(Op(r"b^\dagger b", ("ph", i), W0))
for i in range(NSITES - 1):
    hop1 = Op(r"a^\dagger a", [("e", i), ("e", i + 1)], T_HOP)
    hop2 = Op(r"a^\dagger a", [("e", i + 1), ("e", i)], T_HOP)
    terms += [hop1, hop2]
    for hop in (
        Op(r"a^\dagger a", [("e", i + 1), ("e", i)], G),
        Op(r"a^\dagger a", [("e", i), ("e", i + 1)], G),
    ):
        terms.append(hop * Op(r"b^\dagger+b", ("ph", i + 1), 1.0))
        terms.append(hop * Op(r"b^\dagger+b", ("ph", i), -1.0))

model = Model(basis, terms)

M = 32
mps = Mps.random(model, 1, M, percent=1.0)
mps.optimize_config = OptimizeConfig(
    procedure=[[M, 0.4], [M, 0.2], [M, 0.1]] + [[M, 0]] * 6
)
mps.optimize_config.method = "2site"
energies, mps_opt = optimize_mps(mps, Mpo(model))
e = min(float(np.min(np.asarray(x))) for x in energies)
print(f"optical SSH N={NSITES} w0={W0} g={G}: polaron GS energy {e:.8f}")
print("electron occupations:", np.round(np.asarray(mps_opt.e_occupations), 4))
print("phonon occupations:  ", np.round(np.asarray(mps_opt.ph_occupations), 4))
