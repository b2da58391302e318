r"""DMRG ground state on tree tensor networks.

Recursive 2-site sweeps (reference ``renormalizer/tn/gs.py:18-131``); the
local eigenproblem runs through the device Davidson with qn masking.
"""

import logging
from typing import List, Union

import jax.numpy as jnp
import numpy as np

from renormalizer_tpu.lib.solvers import davidson
from renormalizer_tpu.tn.hop_expr import hop_expr2
from renormalizer_tpu.tn.node import TreeNodeTensor
from renormalizer_tpu.tn.tree import TTNEnviron, TTNO, TTNS

logger = logging.getLogger(__name__)


def optimize_ttns(ttns: TTNS, ttno: TTNO, procedure=None):
    """Macro sweeps over the optimization procedure."""
    if procedure is None:
        procedure = ttns.optimize_config.procedure
    ttne = TTNEnviron(ttns, ttno)
    e_list = []
    for m, percent in procedure:
        micro_e = optimize_recursion(ttns.root, ttns, ttno, ttne, m, percent)
        logger.info(f"Micro e: {micro_e}")
        e_list.append(micro_e[-1])
    return e_list


def optimize_recursion(
    snode: TreeNodeTensor, ttns: TTNS, ttno: TTNO, ttne: TTNEnviron,
    m: Union[int, List[int]], percent: float = 0,
) -> List[float]:
    """Optimize ``snode``'s bonds with all of its children, depth-first."""
    assert snode.children  # 2-site algorithm needs at least two nodes
    micro_e = []
    for ichild, child in enumerate(snode.children):
        if child.children:
            e, c = optimize_2site(child, ttns, ttno, ttne)
            micro_e.append(e)
            ttns.update_2site(child, c, m, percent, cano_parent=False)
            ttne.update_2site(child, ttns, ttno)
            micro_e.extend(optimize_recursion(child, ttns, ttno, ttne, m))
        e, c = optimize_2site(child, ttns, ttno, ttne)
        micro_e.append(e)
        ttns.update_2site(child, c, m, percent, cano_parent=True)
        ttne.update_2site(child, ttns, ttno)
    return micro_e


def optimize_2site(snode: TreeNodeTensor, ttns: TTNS, ttno: TTNO, ttne: TTNEnviron):
    """Solve the local 2-site eigenproblem in the qn-restricted full space."""
    cguess = ttns.merge_with_parent(snode)
    qn_mask = ttns.get_qnmask(snode, include_parent=True)
    mask_flat = jnp.asarray(qn_mask.ravel())
    expr, hdiag = hop_expr2(snode, ttns, ttno, ttne)
    cshape = qn_mask.shape

    def hop(x):
        x = jnp.where(mask_flat, x, 0)
        out = expr(x.reshape(cshape)).ravel()
        return jnp.where(mask_flat, out, 0)

    assert ttns.optimize_config.nroots == 1
    algo = ttns.optimize_config.algo
    hdiag_eff = jnp.where(mask_flat, hdiag.ravel(), 1e10)
    x0 = jnp.where(mask_flat, jnp.asarray(cguess).ravel(), 0)
    if algo == "davidson":
        from renormalizer_tpu.backend import backend as _backend

        tol = 1e-5 if _backend.is_32bits else 1e-10
        e, c, niter = davidson(hop, x0, hdiag_eff, tol=tol, max_cycle=100)
        e = float(np.asarray(e))
    elif algo == "direct":
        idx = np.nonzero(qn_mask.ravel())[0]
        a_list = []
        dim = qn_mask.size
        for i in idx:
            a = jnp.zeros(dim).at[i].set(1.0)
            a_list.append(np.asarray(hop(a))[idx])
        a = np.array(a_list)
        assert np.allclose(a, a.conj().T, atol=1e-8)
        evals, evecs = np.linalg.eigh(a)
        e = evals[0]
        c_masked = evecs[:, 0]
        c_full = np.zeros(dim)
        c_full[idx] = c_masked
        c = jnp.asarray(c_full)
        return e, c.reshape(cshape)
    else:
        raise NotImplementedError(f"TTNS eigensolver algo={algo} not available")
    return e, c.reshape(cshape)
