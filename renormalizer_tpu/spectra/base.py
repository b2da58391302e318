"""Shared base for time-domain spectra jobs: collects the dipole-dipole
autocorrelation function (reference ``renormalizer/spectra/base.py:12-45``).
NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import numpy as np

from renormalizer_tpu.mps import Mpo
from renormalizer_tpu.utils import CompressConfig, Quantity, TdMpsJob


class SpectraTdMpsJobBase(TdMpsJob):
    def __init__(
        self,
        model,
        spectratype,
        temperature,
        evolve_config=None,
        compress_config=None,
        offset=Quantity(0),
        dump_dir=None,
        job_name=None,
    ):
        self.model = model
        assert spectratype in ("emi", "abs")
        self.spectratype = spectratype
        self.nexciton = 1 if spectratype == "emi" else 0
        self.compress_config = compress_config if compress_config is not None else CompressConfig()
        self.temperature = temperature
        self.h_mpo: Mpo = Mpo(model, offset=offset)
        self._autocorr = []
        super().__init__(evolve_config=evolve_config, dump_dir=dump_dir, job_name=job_name)

    def process_mps(self, braket_pair):
        self._autocorr.append(braket_pair.ft)

    @property
    def autocorr(self):
        return np.array(self._autocorr)

    def get_dump_dict(self):
        return {
            "time series": self.evolve_times,
            "autocorr": self.autocorr,
        }
