"""Spin-boson dynamics on a tree tensor network (zero temperature),
cf. the reference's ttns examples (JCTC 2023, 19, 6070 workflow).

Run: python examples/ttns_sbm.py
"""
import numpy as np

from renormalizer_tpu import BasisHalfSpin, Op, Quantity
from renormalizer_tpu.model import Model
from renormalizer_tpu.model.basis import BasisSHO
from renormalizer_tpu.sbm import ColeDavidsonSDF
from renormalizer_tpu.tn import BasisTree, TTNO, TTNS
from renormalizer_tpu.tn.node import TreeNodeBasis
from renormalizer_tpu.utils import EvolveConfig, EvolveMethod

# discretized Cole-Davidson bath coupled to one spin
eps, delta = 0.0, 1.0
nmodes = 8
sdf = ColeDavidsonSDF(ita=0.5, omega_c=5.0, beta=0.5, omega_limit=50.0)
w, c2 = sdf.Wang1(nmodes)
c = np.sqrt(c2)

basis_list = [BasisHalfSpin("spin")]
ham_terms = [Op("sigma_z", "spin", eps), Op("sigma_x", "spin", delta)]
for i in range(nmodes):
    basis_list.append(BasisSHO(("v", i), float(w[i]), 6))
    ham_terms.append(Op(r"b^\dagger b", ("v", i), float(w[i])))
    ham_terms.append(Op(r"sigma_z x", ["spin", ("v", i)], float(c[i]) / 2))

model = Model(basis_list, ham_terms)
tree = BasisTree.binary_mctdh(model.basis)
ttno = TTNO(tree, model.ham_terms)
ttns = TTNS(tree, condition={"spin": 0})
ttns = ttns.expand_bond_dimension(ttno)
ttns.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
sigma_z = TTNO(tree, [Op("sigma_z", "spin")])
traj = []
for _ in range(10):
    ttns = ttns.evolve(ttno, 0.1)
    traj.append(float(ttns.expectation(sigma_z)))
print("sigma_z(t):", np.round(traj, 4))
