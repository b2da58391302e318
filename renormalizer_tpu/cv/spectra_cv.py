r"""Frequency-domain DDMRG (correction vector) base machinery.

Per frequency point the response is obtained by sweeping a site-local linear
solve of ((H - e0 - omega)^2 + eta^2) |x> = -eta mu |0>.
Reference ``renormalizer/cv/spectra_cv.py:17-205``.

Parallelism: each frequency point is independent.  ``batch_run`` uses a
process pool like the reference; on a TPU fleet the natural mapping is one
frequency point per chip (see ``renormalizer_tpu/parallel``).
"""

import logging
from multiprocessing import Pool

import numpy as np

from renormalizer_tpu.mps import Mpo
from renormalizer_tpu.utils import CompressConfig, CompressCriteria

logger = logging.getLogger(__name__)


def batch_run(freq_reg, cores, obj, filename=None):
    """Evaluate the CV response over a frequency window.

    ``cores > 1`` distributes points over a process pool (embarrassingly
    parallel; each process drives its own device context)."""
    logger.info(f"{len(freq_reg)} total frequency points to do")
    spectra = []
    obj.batch_run = True
    if cores > 1:
        pool = Pool(processes=cores)
        logger.info(f"{cores} multiprocess parallelization activated")
        for i_spec in pool.imap(obj.cv_solve, freq_reg):
            spectra.append(i_spec)
            if filename is not None:
                np.save(f"{filename}", spectra)
        pool.close()
        pool.join()
    elif cores == 1:
        for omega in freq_reg:
            spectra.append(obj.cv_solve(omega))
            if filename is not None:
                np.save(f"{filename}", spectra)
    else:
        raise AssertionError
    return spectra


class SpectraCv:
    def __init__(
        self,
        model,
        spectratype,
        m_max,
        eta,
        h_mpo=None,
        method="1site",
        procedure_cv=None,
        rtol=1e-5,
        b_mps=None,
        e0=None,
        cv_mps=None,
    ):
        self.model = model
        assert spectratype in ("abs", "emi", None)
        self.spectratype = spectratype
        self.m_max = m_max
        self.eta = eta
        self.h_mpo = h_mpo if h_mpo is not None else Mpo(model)
        assert method in ("1site", "2site")
        self.method = method
        logger.info(f"cv optimize method: {method}")
        if procedure_cv is None:
            procedure_cv = [0.4, 0.4, 0.2, 0.2, 0.1, 0.1] + [0] * 45
        self.procedure_cv = procedure_cv
        self.rtol = rtol

        if b_mps is None:
            self.b_mps, self.e0 = self.init_b_mps()
        else:
            self.b_mps = b_mps
            self.e0 = e0
        self.cv_mps = cv_mps if cv_mps is not None else self.init_cv_mps()
        self.cv_mps.compress_config = CompressConfig(
            CompressCriteria.fixed, max_bonddim=m_max
        )

        self.hop_time = []
        self.macro_iteration_result = []
        self.batch_run = False
        logger.info("DDMRG job created.")

    def cv_solve(self, omega):
        """Sweeping solve at one frequency; returns the response value.

        The previous frequency's ``cv_mps`` is kept as the warm start, but the
        iteration statistics start fresh for every frequency point."""
        self.clear_res()
        converged = False
        len_cv = len(self.cv_mps)
        self.oper_prepare(omega)

        lr_group = None
        isweep = 0
        for idx, procedure in enumerate(self.procedure_cv):
            isweep = idx + 1
            if self.cv_mps.to_right and self.cv_mps.qnidx == 0:
                irange = np.arange(1 if self.method == "1site" else 2, len_cv + 1)
            elif (not self.cv_mps.to_right) and self.cv_mps.qnidx == self.cv_mps.site_num - 1:
                irange = np.arange(len_cv, 0 if self.method == "1site" else 1, -1)
            else:
                raise AssertionError
            if isweep == 1:
                lr_group = self.initialize_LR()
            micro = []
            for isite in irange:
                l_value = self.optimize_cv(lr_group, isite, percent=procedure)
                at_sweep_end = self.method == "1site" and (
                    ((not self.cv_mps.to_right) and isite == 1)
                    or (self.cv_mps.to_right and isite == len_cv)
                )
                if not at_sweep_end:
                    lr_group = self.update_LR(lr_group, isite)
                micro.append(-1.0 / (np.pi * self.eta) * l_value)
                logger.debug(
                    f"omega:{omega}, isweep:{isweep}, isite:{isite}, "
                    f"response:{micro[-1]}"
                )
            self.cv_mps.to_right = not self.cv_mps.to_right
            self.macro_iteration_result.append(max(micro))
            if idx > 0 and procedure == 0:
                v1, v2 = sorted(self.macro_iteration_result)[-2:]
                if abs((v1 - v2) / v1) < self.rtol:
                    converged = True
                    break
        if converged:
            logger.info("cv converged!")
        else:
            logger.warning("cv *NOT* converged!")
        logger.info(
            f"omega:{omega}, sweeps:{isweep}, "
            f"res:{max(self.macro_iteration_result)}"
        )
        res = max(self.macro_iteration_result)
        if self.batch_run:
            self.clear_res()
        return res

    def clear_res(self):
        self.hop_time.clear()
        self.macro_iteration_result.clear()

    # subclass hooks
    def init_cv_mps(self):
        raise NotImplementedError

    def init_b_mps(self):
        raise NotImplementedError

    def oper_prepare(self, omega):
        raise NotImplementedError

    def optimize_cv(self, lr_group, isite, percent=0):
        raise NotImplementedError

    def initialize_LR(self):
        raise NotImplementedError

    def update_LR(self, lr_group, isite):
        raise NotImplementedError
