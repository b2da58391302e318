r"""DMRG ground state on tree tensor networks.

Recursive 2-site sweeps (reference ``renormalizer/tn/gs.py:18-131``); the
local eigenproblem runs through the device Davidson with qn masking.
"""

import logging
from typing import List, Union

import jax.numpy as jnp
import numpy as np

from renormalizer_tpu.lib.solvers import davidson, davidson_multiroot
from renormalizer_tpu.tn.hop_expr import hop_expr2
from renormalizer_tpu.tn.node import TreeNodeTensor
from renormalizer_tpu.tn.tree import TTNEnviron, TTNO, TTNS

logger = logging.getLogger(__name__)


def _solver_tol() -> float:
    from renormalizer_tpu.backend import backend

    return 1e-5 if backend.is_32bits else 1e-10


def optimize_ttns(ttns: TTNS, ttno: TTNO, procedure=None):
    """Macro sweeps over the optimization procedure; returns the final
    micro-sweep energy of each macro sweep (reference semantics)."""
    sweeps = ttns.optimize_config.procedure if procedure is None else procedure
    ttne = TTNEnviron(ttns, ttno)
    macro_e = []
    for isweep, (m, percent) in enumerate(sweeps):
        micro_e = optimize_recursion(ttns.root, ttns, ttno, ttne, m, percent)
        # with nroots > 1 each micro energy is a vector; rank by the lowest root
        best = min(np.atleast_1d(np.real(e))[0] for e in micro_e)
        logger.info(
            f"TTNS macro sweep {isweep} (m={m}, percent={percent}): "
            f"best micro e {best:.10g}"
        )
        macro_e.append(micro_e[-1])
    return macro_e


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

    # bond-tensor-parallel tree matvec: when a global mesh is installed,
    # shard the two largest divisible free bra axes (child + parent
    # environments) over the mesh's i/j axes (green-field vs the reference,
    # whose tree engine is single-device: ``renormalizer/tn/gs.py:73``)
    from renormalizer_tpu.parallel.mesh import get_global_mesh

    mesh = get_global_mesh()
    if mesh is not None:
        from renormalizer_tpu.parallel import hop as phop
        from renormalizer_tpu.tn.hop_expr import hop_formula2

        formula, operands = hop_formula2(snode, ttns, ttno, ttne)
        operand_shapes = tuple(tuple(o.shape) for o in operands)
        if phop.record_engagement_general(mesh, formula, operand_shapes, cshape):
            sharded = phop.sharded_general_hop_factory(
                mesh, formula, operand_shapes, cshape)
            expr = lambda c: sharded(*operands, c).reshape(cshape)  # noqa: E731

    def hop(x):
        x = jnp.where(mask_flat, x, 0)
        out = expr(x.reshape(cshape)).ravel()
        return jnp.where(mask_flat, out, 0)

    nroots = ttns.optimize_config.nroots
    algo = ttns.optimize_config.algo
    hdiag_eff = jnp.where(mask_flat, hdiag.ravel(), 1e10)
    x0 = jnp.where(mask_flat, jnp.asarray(cguess).ravel(), 0)
    if nroots > 1:
        # state-averaged: block Davidson for the nroots lowest local
        # eigenpairs; downstream truncation averages the density matrices
        # (exceeds the reference, whose tree engine is single-root:
        # ``renormalizer/tn/gs.py:73``)
        rng = np.random.default_rng(2019)
        x0_list = [x0] + [
            jnp.where(mask_flat, jnp.asarray(rng.random(qn_mask.size) - 0.5), 0)
            for _ in range(nroots - 1)
        ]
        thetas, X, _ = davidson_multiroot(
            hop, x0_list, hdiag_eff, nroots, tol=_solver_tol(), max_cycle=100
        )
        es = [float(t) for t in np.asarray(thetas)]
        cs = [X[i].reshape(cshape) for i in range(nroots)]
        return es, cs
    if algo == "davidson":
        e, c, niter = davidson(
            hop, x0, hdiag_eff, tol=_solver_tol(), max_cycle=100
        )
        e = float(np.asarray(e))
    elif algo == "arpack":
        # host Lanczos (scipy eigsh) restricted to the masked subspace —
        # cross-validates the device Davidson (reference tree option:
        # ``renormalizer/tn/gs.py:105-109``)
        import scipy.sparse.linalg

        idx = np.nonzero(np.asarray(qn_mask).ravel())[0]
        dim = qn_mask.size
        if len(idx) <= 1:
            return _eigh_dense_masked(hop, qn_mask, cshape)

        def matvec(x):
            full = np.zeros(dim, dtype=x.dtype)
            full[idx] = x
            return np.asarray(hop(jnp.asarray(full)))[idx]

        lo = scipy.sparse.linalg.LinearOperator(
            (len(idx), len(idx)), matvec=matvec, dtype=np.float64
        )
        v0 = np.asarray(x0)[idx]
        w, v = scipy.sparse.linalg.eigsh(lo, k=1, which="SA", v0=v0)
        e = float(w[0])
        c = jnp.zeros(dim).at[jnp.asarray(idx)].set(jnp.asarray(v[:, 0]))
    elif algo == "direct":
        return _eigh_dense_masked(hop, qn_mask, cshape)
    else:
        raise NotImplementedError(f"TTNS eigensolver algo={algo} not available")
    return e, c.reshape(cshape)


def _eigh_dense_masked(hop, qn_mask, cshape):
    """Materialize H on the masked subspace and diagonalize (debug-grade)."""
    idx = np.nonzero(np.asarray(qn_mask).ravel())[0]
    dim = qn_mask.size
    a = np.array([
        np.asarray(hop(jnp.zeros(dim).at[i].set(1.0)))[idx] for i in idx
    ])
    assert np.allclose(a, a.conj().T, atol=1e-8)
    evals, evecs = np.linalg.eigh(a)
    c_full = np.zeros(dim)
    c_full[idx] = evecs[:, 0]
    return evals[0], jnp.asarray(c_full).reshape(cshape)
