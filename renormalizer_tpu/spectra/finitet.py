r"""Finite-temperature spectra: beta/2 imaginary-time propagation of a
max-entangled density matrix, then real-time two-way propagation.

Reference ``renormalizer/spectra/finitet.py:16-150``.  Emission conjugates
the transition amplitude (``finitet.py:16-18``).

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import logging
import os

import numpy as np

from renormalizer_tpu.mps import MpDm, Mpo, ThermalProp
from renormalizer_tpu.mps.mps import BraKetPair
from renormalizer_tpu.spectra.base import SpectraTdMpsJobBase
from renormalizer_tpu.utils import CompressConfig, EvolveConfig

logger = logging.getLogger(__name__)


class BraKetPairEmiFiniteT(BraKetPair):
    def calc_ft(self):
        return np.conj(super().calc_ft())


class BraKetPairAbsFiniteT(BraKetPair):
    pass


class SpectraFiniteT(SpectraTdMpsJobBase):
    def __init__(
        self,
        model,
        spectratype,
        temperature,
        insteps,
        offset,
        evolve_config=None,
        icompress_config=None,
        ievolve_config=None,
        gs_shift=0,
        dump_dir: str = None,
        job_name=None,
    ):
        self.temperature = temperature
        self.insteps = insteps
        self.gs_shift = gs_shift
        self.icompress_config = icompress_config if icompress_config is not None else CompressConfig()
        self.ievolve_config = ievolve_config if ievolve_config is not None else EvolveConfig()
        self.dump_dir = dump_dir
        self.job_name = job_name
        super().__init__(
            model, spectratype, temperature,
            evolve_config=evolve_config, offset=offset,
            dump_dir=dump_dir, job_name=job_name,
        )

    @property
    def _thermal_dump_path(self):
        assert self._defined_output_path
        return os.path.join(self.dump_dir, self.job_name + "_impo.npz")

    def init_mps(self):
        if self.spectratype == "emi":
            return self.init_mps_emi()
        return self.init_mps_abs()

    def init_mps_emi(self):
        dipole_mpo = Mpo.onsite(self.model, "a", dipole=True)
        i_mpo = MpDm.max_entangled_ex(self.model)
        i_mpo.compress_config = self.icompress_config
        job_name = None if self.job_name is None else self.job_name + "_thermal_prop"
        tp = ThermalProp(
            i_mpo, evolve_config=self.ievolve_config,
            dump_dir=self.dump_dir, job_name=job_name,
        )
        if tp._defined_output_path:
            try:
                logger.info(f"load density matrix from {self._thermal_dump_path}")
                ket_mpo = MpDm.load(self.model, self._thermal_dump_path)
            except FileNotFoundError:
                tp.evolve(None, self.insteps, self.temperature.to_beta() / 2j)
                ket_mpo = tp.latest_mps
                ket_mpo.dump(self._thermal_dump_path)
        else:
            tp.evolve(None, self.insteps, self.temperature.to_beta() / 2j)
            ket_mpo = tp.latest_mps
        ket_mpo.evolve_config = self.evolve_config
        dipole_mpo_dagger = dipole_mpo.conj_trans()
        dipole_mpo_dagger.build_empty_qn()
        a_ket_mpo = ket_mpo.apply(dipole_mpo_dagger, canonicalise=True)
        a_ket_mpo.normalize("mps_norm_to_coeff")
        a_bra_mpo = a_ket_mpo.copy()
        return BraKetPairEmiFiniteT(a_bra_mpo, a_ket_mpo)

    def init_mps_abs(self):
        dipole_mpo = Mpo.onsite(self.model, r"a^\dagger", dipole=True)
        i_mpo = MpDm.max_entangled_gs(self.model)
        i_mpo.compress_config = self.icompress_config
        beta = self.temperature.to_beta()
        tp = ThermalProp(i_mpo, exact=True, space="GS")
        tp.evolve(None, 1, beta / 2j)
        ket_mpo = tp.latest_mps
        ket_mpo.evolve_config = self.evolve_config
        a_ket_mpo = dipole_mpo.apply(ket_mpo, canonicalise=True)
        if self.evolve_config.is_tdvp:
            a_ket_mpo = a_ket_mpo.expand_bond_dimension(self.h_mpo)
        a_ket_mpo.normalize("mps_norm_to_coeff")
        a_bra_mpo = a_ket_mpo.copy()
        return BraKetPairAbsFiniteT(a_bra_mpo, a_ket_mpo)

    def evolve_single_step(self, evolve_dt):
        bra_mpo, ket_mpo = self.latest_mps
        if len(self.evolve_times) % 2 == 1:
            ket_mpo = ket_mpo.evolve_exact(self.h_mpo, -evolve_dt, "GS")
            ket_mpo = ket_mpo.evolve(self.h_mpo, evolve_dt)
        else:
            bra_mpo = bra_mpo.evolve_exact(self.h_mpo, evolve_dt, "GS")
            bra_mpo = bra_mpo.evolve(self.h_mpo, -evolve_dt)
        return self.latest_mps.__class__(bra_mpo, ket_mpo)

    def get_dump_dict(self):
        return {
            "temperature": self.temperature.as_au(),
            "time series": self.evolve_times,
            "autocorr": self.autocorr,
        }

    def stop_evolve_criteria(self):
        corr = self.autocorr
        if len(corr) < 10:
            return False
        last, first = corr[-10:], corr[0]
        return (
            np.abs(last.mean()) < 1e-5 * np.abs(first)
            and last.std() < 1e-5 * np.abs(first)
        )
