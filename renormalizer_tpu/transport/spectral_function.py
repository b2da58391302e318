r"""One-particle retarded Green's function at zero temperature for a
translational invariant 1D model:

.. math::
    iG_{ij}(t) = \langle 0| c_i(t) c^\dagger_j |0\rangle

stored per |i-j| (translational invariance) with its k-space transform.
For finite-T use thermofield dynamics with a transformed Hamiltonian
(J. Chem. Phys. 145, 224101 (2016)).
Reference ``renormalizer/transport/spectral_function.py:15-137``.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import logging

import numpy as np

from renormalizer_tpu.model import TI1DModel
from renormalizer_tpu.mps import Mpo, Mps
from renormalizer_tpu.utils import CompressConfig, EvolveConfig, Quantity, TdMpsJob

logger = logging.getLogger(__name__)


class SpectralFunctionZT(TdMpsJob):
    def __init__(
        self,
        model: TI1DModel,
        compress_config: CompressConfig = None,
        evolve_config: EvolveConfig = None,
        dump_dir: str = None,
        job_name: str = None,
    ):
        self.model = model
        self.compress_config = compress_config if compress_config is not None else CompressConfig()
        self._G_array = []
        self.e_occupations_array = []
        self.temperature = Quantity(0)
        super().__init__(evolve_config=evolve_config, dump_dir=dump_dir, job_name=job_name)

    @property
    def G_array(self):
        """G_{ij}(t): first axis t, second axis |i-j|."""
        return np.array(self._G_array)

    def init_mps(self):
        creation_oper = Mpo.onsite(self.model, r"a^\dagger", dof_set=[self.model.e_dofs[0]])
        gs = Mps.ground_state(self.model, False)
        self.h_mpo = Mpo(self.model, offset=Quantity(gs.expectation(Mpo(self.model))))
        a_ket = creation_oper.apply(gs, canonicalise=True)
        a_ket.compress_config = self.compress_config
        a_ket.evolve_config = self.evolve_config
        a_ket.normalize("mps_norm_to_coeff")
        if self.evolve_config.is_tdvp:
            a_ket = a_ket.expand_bond_dimension(self.h_mpo)
        return (gs, a_ket)

    def process_mps(self, mps):
        key = "a"
        if key not in self.model.mpos:
            self.model.mpos[key] = [
                Mpo.onsite(self.model, "a", dof_set=[dof]) for dof in self.model.e_dofs
            ]
        a_opers = self.model.mpos[key]
        a_bra, a_ket = mps
        G = a_ket.expectations(a_opers, a_bra.conj()) / 1j
        self._G_array.append(G)
        self.e_occupations_array.append(a_ket.e_occupations)

    def evolve_single_step(self, evolve_dt):
        bra, ket = self.latest_mps
        return (bra, ket.evolve(self.h_mpo, evolve_dt))

    def get_dump_dict(self):
        dump_dict = {
            "temperature": self.temperature.as_au(),
            "time series": self.evolve_times,
            "G array": self.G_array,
        }
        ne = self.model.n_edofs
        n_kpoints = ne // 2 + 1
        ka = (np.arange(n_kpoints) * (2 * np.pi) / ne).reshape(1, 1, -1)
        ijdiff = np.arange(ne).reshape(1, -1, 1)
        dump_dict["Gk array"] = np.sum(
            self.G_array.reshape(-1, ne, 1) * np.exp(1j * ka * ijdiff), axis=1
        )
        dump_dict["electron occupations array"] = self.e_occupations_array
        return dump_dict
