"""Tree tensor network states: ground state + TDVP dynamics on a binary tree.

Run: python examples/ttns_mctdh.py
"""
import numpy as np

from renormalizer_tpu import HolsteinModel, Mol, Phonon, Quantity
from renormalizer_tpu.tn import BasisTree, TTNO, TTNS, optimize_ttns
from renormalizer_tpu.utils import EvolveConfig, EvolveMethod

ph = Phonon.simple_phonon(Quantity(0.01), Quantity(0.3), 4)
model = HolsteinModel([Mol(Quantity(0.1), [ph])] * 3, Quantity(-0.02))

tree = BasisTree.binary(model.basis)
ttno = TTNO(tree, model.ham_terms)
ttns = TTNS.random(tree, 1, 16)
energies = optimize_ttns(ttns, ttno, [[16, 0.4], [16, 0.2], [16, 0], [16, 0]])
print("tree DMRG energy:", min(energies))

state = TTNS(tree, condition={0: 1}).expand_bond_dimension(ttno)
state.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
for _ in range(5):
    state = state.evolve(ttno, 4.0)
print("energy drift:", abs(state.expectation(ttno) - TTNS(tree, condition={0: 1}).expand_bond_dimension(ttno).expectation(ttno)))
