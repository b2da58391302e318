r"""Electron-phonon helpers for tree tensor networks.

Reference ``renormalizer/tn/utils_eph.py``: max-entangled excited state for
thermofield finite-temperature dynamics on a P/Q-doubled basis tree.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import numpy as np

from renormalizer_tpu.model import Op
from renormalizer_tpu.tn.node import TreeNodeTensor, copy_connection
from renormalizer_tpu.tn.tree import TTNO, TTNS
from renormalizer_tpu.tn.treebase import BasisTree


def max_entangled_ex(basis_tree: BasisTree) -> TTNS:
    """T=inf max-entangled one-exciton TTNS on a P/Q-doubled tree."""
    node_tensor_list = []
    for basis_node in basis_tree:
        nbas = basis_node.basis_sets[0].nbas
        if basis_node.n_sets == 1:
            assert nbas == 1
            tensor = np.ones([1] * len(basis_node.children) + [1, 1])
        elif basis_node.n_sets == 2 and basis_node.basis_sets[0].is_phonon:
            shape = [1] * len(basis_node.children) + [nbas, nbas, 1]
            tensor = np.eye(nbas).reshape(shape) / np.sqrt(nbas)
        elif basis_node.n_sets == 2 and basis_node.basis_sets[0].is_electron:
            shape = [1] * len(basis_node.children) + [nbas, nbas, 1]
            tensor = np.zeros(shape)
            tensor[..., 0, 0, 0] = 1
        else:
            raise AssertionError
        node = TreeNodeTensor(tensor, np.zeros((1, basis_tree.qn_size), dtype=int))
        node_tensor_list.append(node)

    copy_connection(basis_tree.node_list, node_tensor_list)
    ttns = TTNS(basis_tree, root=node_tensor_list[0])
    ex_ops = []
    for b in basis_tree.basis_list:
        # skip the auxiliary Q space
        if isinstance(b.dof, tuple) and len(b.dof) == 2 and b.dof[0] == "Q":
            continue
        if b.is_electron:
            ex_ops.append(
                Op(r"a^\dagger a^\dagger", [b.dof, ("Q", b.dofs)], qn=[1, 0])
            )
    ex_ttno = TTNO(basis_tree, ex_ops)
    ttns = ex_ttno.apply(ttns)
    ttns.normalize("ttns_and_coeff")
    return ttns
