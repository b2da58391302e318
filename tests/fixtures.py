"""Shared test fixtures mirroring the reference's regression setups
(``renormalizer/tests/parameter.py`` and ``parameter_exact.py``)."""

import numpy as np

from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
from renormalizer_tpu.utils import Quantity, constant

# --- the 3-mol Holstein fixture (reference ``tests/parameter.py:1-31``) ----
elocalex = Quantity(2.67, "eV")
dipole_abs = 15.45
nmols = 3
j_matrix = (
    np.array([[0.0, -0.1, -0.2], [-0.1, 0.0, -0.3], [-0.2, -0.3, 0.0]])
    / constant.au2ev
)
omega_quantities = [Quantity(106.51, "cm^{-1}"), Quantity(1555.55, "cm^{-1}")]
omega = [[q, q] for q in omega_quantities]
displacement_quantities = [Quantity(30.1370, "a.u."), Quantity(8.7729, "a.u.")]
displacement = [[Quantity(0), d] for d in displacement_quantities]
ph_phys_dim = [4, 4]
ph_list = [Phonon(*args) for args in zip(omega, displacement, ph_phys_dim)]

holstein_model = HolsteinModel([Mol(elocalex, ph_list, dipole_abs)] * nmols, j_matrix)
holstein_model4 = holstein_model.switch_scheme(4)

offset = Quantity(2.28614053, "ev") + Quantity(holstein_model.gs_zpe)

# reference regression value (``mps/tests/test_gs.py:21``)
GS_E = 0.08401412 + holstein_model.gs_zpe


# --- tiny exactly solvable Holstein (reference ``tests/parameter_exact.py``)
def exact_model():
    ph = Phonon.simple_phonon(Quantity(1), Quantity(1), 2)
    mol = Mol(Quantity(0), [ph])
    model = HolsteinModel([mol] * 3, Quantity(1), 3)
    return model


def dense_hamiltonian(model):
    """Dense H assembled directly from the symbolic layer (kron oracle)."""
    dim = int(np.prod(model.pbond_list))
    H = np.zeros((dim, dim), dtype=complex)
    for op in model.ham_terms:
        elem_ops, factor = op.split_elementary(model.dof_to_siteidx)
        site_mats = {
            model.dof_to_siteidx[e.dofs[0]]: model.dof_to_basis[e.dofs[0]].op_mat(e)
            for e in elem_ops
        }
        full = np.eye(1)
        for i, b in enumerate(model.basis):
            full = np.kron(full, site_mats.get(i, np.eye(b.nbas)))
        H = H + factor * full
    if np.allclose(H.imag, 0):
        H = H.real
    return H
