r"""Spectra via the exact local propagator (bond-1 e^{xH} for local H).

Reference ``renormalizer/spectra/exact.py:16-116``.  Supports zero-T
emission for any Holstein chain and abs/emi at any temperature for a single
molecule.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import logging

from renormalizer_tpu.mps import MpDm, Mpo, Mps, ThermalProp, gs
from renormalizer_tpu.mps.mps import BraKetPair
from renormalizer_tpu.spectra.base import SpectraTdMpsJobBase
from renormalizer_tpu.utils import OptimizeConfig, Quantity

logger = logging.getLogger(__name__)


class SpectraExact(SpectraTdMpsJobBase):
    def __init__(
        self,
        model,
        spectratype,
        temperature=Quantity(0, "K"),
        optimize_config=None,
        offset=Quantity(0),
        ex_shift=0,
        gs_shift=0,
    ):
        assert ex_shift == gs_shift == 0
        assert temperature == 0
        if spectratype == "emi":
            self.space1, self.space2 = "EX", "GS"
        else:
            assert len(model) == 1
            self.space1, self.space2 = "GS", "EX"
        self.optimize_config = optimize_config if optimize_config is not None else OptimizeConfig()
        super().__init__(model, spectratype, temperature, offset=offset)
        self.i_mps = self.latest_mps.ket_mps
        self.e_mean = self.i_mps.expectation(self.h_mpo)

    def init_mps(self):
        mmax = self.optimize_config.procedure[0][0]
        i_mps = Mps.random(self.h_mpo.model, self.nexciton, mmax, 1)
        i_mps.optimize_config = self.optimize_config
        _, i_mps = gs.optimize_mps(i_mps, self.h_mpo)
        operator = "a" if self.spectratype == "emi" else r"a^\dagger"
        dipole_mpo = Mpo.onsite(self.model, operator, dipole=True)
        if self.temperature != 0:
            beta = self.temperature.to_beta()
            i_mpdm = MpDm.from_mps(i_mps)
            tp = ThermalProp(i_mpdm, exact=True, space=self.space1)
            tp.evolve(None, 1, beta / 2j)
            ket_mps = tp.latest_mps
        else:
            ket_mps = i_mps
        a_ket_mps = dipole_mpo.apply(ket_mps, canonicalise=True)
        a_ket_mps.normalize("mps_norm_to_coeff")
        a_bra_mps = ket_mps.copy() if self.temperature != 0 else a_ket_mps.copy()
        return BraKetPair(a_bra_mps, a_ket_mps)

    def evolve_single_step(self, evolve_dt):
        bra, ket = self.latest_mps
        ket = ket.evolve_exact(self.h_mpo, evolve_dt, self.space2)
        if self.temperature != 0:
            bra = bra.evolve_exact(self.h_mpo, evolve_dt, self.space1)
        return BraKetPair(bra, ket)
