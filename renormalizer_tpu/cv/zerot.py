r"""Zero-temperature DDMRG absorption/emission spectra.

Per frequency omega the correction vector solves

    ((H - e0 - omega)^2 + eta^2) |x> = -eta mu |psi_0>

by a site-local conjugate-gradient sweep.  TPU design: the per-site CG runs
as one fused jitted ``jax.scipy.sparse.linalg.cg`` over the einsum-defined
squared effective operator — no host round-trips inside the solve.
Reference ``renormalizer/cv/zerot.py:25-417``.
"""

import logging
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from renormalizer_tpu.cv.spectra_cv import SpectraCv
from renormalizer_tpu.mps import Mpo, Mps, gs
from renormalizer_tpu.mps.lib import cvec2cmat
from renormalizer_tpu.mps.svd_qn import get_qn_mask
from renormalizer_tpu.ops.contract import einsum, hop_diag, hop_spec
from renormalizer_tpu.utils import OptimizeConfig

logger = logging.getLogger(__name__)


@lru_cache(maxsize=None)
def _cg_factory(formula: str, cshape, eta: float, tol: float):
    dim = int(np.prod(cshape))

    @jax.jit
    def solve(x0, b, a_diag, mask_idx, *operands):
        def matvec(x):
            full = jnp.zeros(dim, dtype=x.dtype).at[mask_idx].set(x)
            out = jnp.einsum(
                formula, *operands, full.reshape(cshape), optimize="optimal"
            ).ravel()[mask_idx]
            return out + eta ** 2 * x

        x, _ = jax.scipy.sparse.linalg.cg(
            matvec, b, x0=x0, tol=tol, M=lambda v: v / a_diag, maxiter=100
        )
        l_value = x @ matvec(x) - 2 * (b @ x)
        return x, l_value

    return solve


class SpectraZtCV(SpectraCv):
    r"""Zero-T DDMRG spectrum (see :class:`SpectraCv` for arguments;
    ``procedure_gs`` controls the ground-state DMRG)."""

    def __init__(self, model, spectratype, m_max, eta, h_mpo=None,
                 method="1site", procedure_cv=None, rtol=1e-5, b_mps=None,
                 e0=None, cv_mps=None, procedure_gs=None):
        self.procedure_gs = procedure_gs
        self.a_oper = None
        super().__init__(
            model, spectratype, m_max, eta, h_mpo=h_mpo, method=method,
            procedure_cv=procedure_cv, rtol=rtol, b_mps=b_mps, e0=e0,
            cv_mps=cv_mps,
        )

    def init_b_mps(self):
        """b = -eta * mu * |psi_0| via ground-state DMRG
        (reference ``cv/zerot.py:80-112``)."""
        if self.spectratype == "abs":
            nexciton, dipoletype = 0, r"a^\dagger"
        else:
            nexciton, dipoletype = 1, "a"
        if self.procedure_gs is None:
            self.procedure_gs = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
        mps = Mps.random(self.model, nexciton, self.procedure_gs[0][0], percent=1.0)
        mps.optimize_config = OptimizeConfig(procedure=self.procedure_gs)
        mps.optimize_config.method = "2site"
        energies, mps = gs.optimize_mps(mps, self.h_mpo)
        e0 = min(energies)
        dipole_mpo = Mpo.onsite(self.model, dipoletype, dipole=True)
        b_mps = dipole_mpo.apply(mps.scale(-self.eta))
        return b_mps, e0

    def init_cv_mps(self):
        assert self.b_mps is not None
        cv_mps = Mps.random(self.model, self.b_mps.qntot, self.m_max, percent=1.0)
        logger.info(f"cv_mps random guess qntot: {cv_mps.qntot}")
        return cv_mps

    def oper_prepare(self, omega):
        identity = Mpo.identity(self.model).scale(-self.e0 - omega)
        self.a_oper = self.h_mpo.add(identity)

    def optimize_cv(self, lr_group, isite, percent=0.0):
        first_LR, second_LR = lr_group
        constrain_qn = self.cv_mps.qntot

        if self.method == "1site":
            cidx = [isite - 1]
            first_L, first_R = first_LR[isite - 1], first_LR[isite]
            second_L, second_R = second_LR[isite - 1], second_LR[isite]
        else:
            cidx = [isite - 2, isite - 1]
            first_L, first_R = first_LR[isite - 2], first_LR[isite]
            second_L, second_R = second_LR[isite - 2], second_LR[isite]

        qnbigl, qnbigr, qnmat = self.cv_mps._get_big_qn(cidx)
        qn_mask = get_qn_mask(qnmat, constrain_qn)
        xshape = qn_mask.shape
        mask_idx = jnp.asarray(np.nonzero(qn_mask.ravel())[0])

        cmo = [self.a_oper[i] for i in cidx]
        if self.method == "1site":
            guess = self.cv_mps[isite - 1].ravel()[mask_idx]
            vec_b = einsum(
                "ab,acd,de->bce", second_L, self.b_mps[isite - 1], second_R
            ).ravel()[mask_idx]
        else:
            guess = jnp.tensordot(
                self.cv_mps[isite - 2], self.cv_mps[isite - 1], axes=(-1, 0)
            ).ravel()[mask_idx]
            vec_b = einsum(
                "ab,acd,def,fg->bceg",
                second_L, self.b_mps[isite - 2], self.b_mps[isite - 1], second_R,
            ).ravel()[mask_idx]

        # diagonal preconditioner of the squared operator
        a_diag = hop_diag(first_L, first_R, cmo, twolayer=True)
        a_diag = a_diag.ravel()[mask_idx] + self.eta ** 2

        formula, operands = hop_spec(first_L, first_R, cmo, xshape, twolayer=True)
        solve = _cg_factory(formula, tuple(xshape), float(self.eta), 1e-5)
        x, l_value = solve(guess, vec_b, a_diag, mask_idx, *operands)
        # l_value stays a device scalar; realized once per sweep in the driver

        xstruct = cvec2cmat(x, qn_mask)
        self.cv_mps._update_mps(xstruct, cidx, qnbigl, qnbigr, percent)
        if self.cv_mps.compress_config.ofs is not None:
            raise NotImplementedError("OFS for correction vector not implemented")
        return l_value

    # LR environments: first for the squared operator (4-leg), second for the
    # <b|x> overlap (2-leg).  Index i covers sites [0, i) from the left /
    # [i, N) from the right (reference ``cv/zerot.py:307-417``).
    def _first_up(self, env, isite, domain):
        ms = self.cv_mps[isite]
        a = self.a_oper[isite]
        if domain == "L":
            return einsum("abcd,aef,begh,cgij,dik->fhjk", env, ms, a, a, ms)
        return einsum("abcd,efa,gfhb,ihjc,kjd->egik", env, ms, a, a, ms)

    def _second_up(self, env, isite, domain):
        bms = self.b_mps[isite]
        ms = self.cv_mps[isite]
        if domain == "L":
            return einsum("ab,acd,bce->de", env, bms, ms)
        return einsum("ab,cda,edb->ce", env, bms, ms)

    def initialize_LR(self):
        n = len(self.cv_mps)
        first_LR = [None] * (n + 1)
        second_LR = [None] * (n + 1)
        first_LR[0] = jnp.ones((1, 1, 1, 1))
        second_LR[0] = jnp.ones((1, 1))
        first_LR[n] = jnp.ones((1, 1, 1, 1))
        second_LR[n] = jnp.ones((1, 1))
        if self.cv_mps.to_right:
            for isite in range(n, 1, -1):
                first_LR[isite - 1] = self._first_up(first_LR[isite], isite - 1, "R")
                second_LR[isite - 1] = self._second_up(second_LR[isite], isite - 1, "R")
        else:
            for isite in range(1, n):
                first_LR[isite] = self._first_up(first_LR[isite - 1], isite - 1, "L")
                second_LR[isite] = self._second_up(second_LR[isite - 1], isite - 1, "L")
        return [first_LR, second_LR]

    def update_LR(self, lr_group, isite):
        first_LR, second_LR = lr_group
        if self.method == "1site":
            if not self.cv_mps.to_right:
                first_LR[isite - 1] = self._first_up(first_LR[isite], isite - 1, "R")
                second_LR[isite - 1] = self._second_up(second_LR[isite], isite - 1, "R")
            else:
                first_LR[isite] = self._first_up(first_LR[isite - 1], isite - 1, "L")
                second_LR[isite] = self._second_up(second_LR[isite - 1], isite - 1, "L")
        else:
            if not self.cv_mps.to_right:
                first_LR[isite - 1] = self._first_up(first_LR[isite], isite - 1, "R")
                second_LR[isite - 1] = self._second_up(second_LR[isite], isite - 1, "R")
            else:
                first_LR[isite - 1] = self._first_up(first_LR[isite - 2], isite - 2, "L")
                second_LR[isite - 1] = self._second_up(second_LR[isite - 2], isite - 2, "L")
        return [first_LR, second_LR]
