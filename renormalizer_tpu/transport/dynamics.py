r"""Charge diffusion dynamics by TD-DMRG.

Tracks mean-square displacement, real/k-space electron occupations, phonon
occupations, coherence length and entropies.  Stops when the charge reaches
the chain edge.  Reference ``renormalizer/transport/dynamics.py:24-295``.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import logging
import os
from collections import OrderedDict
from enum import Enum
from functools import partial

import numpy as np
from scipy.linalg import logm

from renormalizer_tpu.model import HolsteinModel
from renormalizer_tpu.mps import MpDm, Mpo, Mps, ThermalProp, load_thermal_state
from renormalizer_tpu.utils import CompressConfig, EvolveConfig, Quantity, TdMpsJob

logger = logging.getLogger(__name__)

EDGE_THRESHOLD = 1e-4


class InitElectron(Enum):
    """How to prepare the initial charge."""

    fc = "franck-condon excitation"
    relaxed = "analytically relaxed phonon(s)"


def calc_r_square(e_occupations):
    r_list = np.arange(0, len(e_occupations))
    if np.allclose(e_occupations, np.zeros_like(e_occupations)):
        return 0
    r_mean_square = np.average(r_list, weights=e_occupations) ** 2
    mean_r_square = np.average(r_list ** 2, weights=e_occupations)
    return float(mean_r_square - r_mean_square)


class ChargeDiffusionDynamics(TdMpsJob):
    r"""Charge diffusion on a Holstein chain; see the reference docstring
    (``transport/dynamics.py:33-86``) for attribute semantics."""

    def __init__(
        self,
        model: HolsteinModel,
        temperature: Quantity = Quantity(0, "K"),
        compress_config: CompressConfig = None,
        evolve_config: EvolveConfig = None,
        stop_at_edge: bool = True,
        init_electron=InitElectron.relaxed,
        rdm: bool = False,
        dump_dir: str = None,
        job_name: str = None,
    ):
        self.model = model
        self.temperature = temperature
        self.mpo = None
        self.init_electron = init_electron
        self.compress_config = compress_config if compress_config is not None else CompressConfig()
        self.energies = []
        self.r_square_array = []
        self.e_occupations_array = []
        self.ph_occupations_array = []
        self.reduced_density_matrices = [] if rdm else None
        self.k_occupations_array = []
        self.eph_vn_entropy_array = []
        self.bond_vn_entropy_array = []
        self.coherent_length_array = []
        if dump_dir is not None and job_name is not None:
            self.thermal_dump_path = os.path.join(dump_dir, job_name + "_impdm.npz")
        else:
            self.thermal_dump_path = None
        super().__init__(evolve_config=evolve_config, dump_dir=dump_dir, job_name=job_name)
        assert self.mpo is not None
        self.elocalex_arrays = []
        self.j_arrays = []
        self.custom_dump_info = OrderedDict()
        self.stop_at_edge = stop_at_edge

    @property
    def mol_num(self):
        return self.model.mol_num

    def create_electron_fc(self, gs_mp):
        center = self.mol_num // 2
        creation_operator = Mpo.onsite(self.model, r"a^\dagger", dof_set=[center])
        return creation_operator.apply(gs_mp)

    def create_electron_relaxed(self, gs_mp):
        """Rotate the center molecule's phonons into the displaced ground
        state before creating the electron (reference
        ``dynamics.py:146-163``)."""
        assert np.allclose(gs_mp.bond_dims, np.ones_like(gs_mp.bond_dims))
        center = self.mol_num // 2
        center_mol = self.model[center]
        for i, ph in enumerate(center_mol.ph_list):
            idx = self.model.order[(center, i)]
            mt = np.asarray(gs_mp[idx])[0, ..., 0]
            mt = ph.get_displacement_evecs().dot(mt)
            gs_mp[idx] = mt.reshape([1] + list(mt.shape) + [1])
        creation_operator = Mpo.onsite(self.model, r"a^\dagger", dof_set=[center])
        return creation_operator.apply(gs_mp)

    def create_electron(self, gs_mp):
        mapping = {
            InitElectron.fc: self.create_electron_fc,
            InitElectron.relaxed: self.create_electron_relaxed,
        }
        logger.info(f"Creating electron using {self.init_electron}")
        return mapping[self.init_electron](gs_mp)

    def init_mps(self):
        tentative_mpo = Mpo(self.model)
        if self.temperature == 0:
            gs_mp = Mps.ground_state(self.model, max_entangled=False)
        else:
            gs_mp = None
            if self.thermal_dump_path is not None:
                gs_mp = load_thermal_state(self.model, self.thermal_dump_path)
            if gs_mp is None:
                gs_mp = MpDm.max_entangled_gs(self.model)
                tp = ThermalProp(gs_mp, exact=True, space="GS")
                tp.evolve(None, max(20, len(gs_mp)), self.temperature.to_beta() / 2j)
                gs_mp = tp.latest_mps
                if self.thermal_dump_path is not None:
                    gs_mp.dump(self.thermal_dump_path)
        init_mp = self.create_electron(gs_mp)
        energy = Quantity(init_mp.expectation(tentative_mpo))
        self.mpo = Mpo(self.model, offset=energy)
        logger.info(f"mpo bond dims: {self.mpo.bond_dims}")
        init_mp.evolve_config = self.evolve_config
        init_mp.compress_config = self.compress_config
        if self.evolve_config.is_tdvp:
            init_mp = init_mp.expand_bond_dimension(self.mpo)
        init_mp.canonicalise()
        return init_mp

    def process_mps(self, mps):
        new_energy = mps.expectation(self.mpo)
        self.energies.append(new_energy)
        if self.reduced_density_matrices is not None:
            rdm = mps.calc_edof_rdm()
            self.reduced_density_matrices.append(rdm)
            n = len(self.model)
            assert rdm.shape == (n, n)
            # k-space occupations: |k> = sum_j e^{-ijk} |j>, k in (-pi, pi]
            transform = np.exp(
                -1j * (np.arange(-n, n, 2) / n * np.pi).reshape(-1, 1)
                * np.arange(0, n).reshape(1, -1)
            ) / np.sqrt(n)
            self.k_occupations_array.append(
                np.diag(transform @ rdm @ transform.conj().T).real
            )
            entropy = -np.trace(rdm @ logm(rdm))
            self.eph_vn_entropy_array.append(entropy)
            self.coherent_length_array.append(np.abs(rdm).sum() - np.trace(rdm).real)
            e_occupations = np.diag(rdm).real
        else:
            e_occupations = mps.e_occupations
        self.e_occupations_array.append(e_occupations)
        self.r_square_array.append(calc_r_square(e_occupations))
        self.ph_occupations_array.append(mps.ph_occupations)
        logger.info(f"e occupations: {self.e_occupations_array[-1]}")
        self.bond_vn_entropy_array.append(mps.calc_bond_entropy())

    def evolve_single_step(self, evolve_dt):
        return self.latest_mps.evolve(self.mpo, evolve_dt)

    def stop_evolve_criteria(self):
        return self.stop_at_edge and EDGE_THRESHOLD < self.e_occupations_array[-1][0]

    def get_dump_dict(self):
        dump_dict = OrderedDict()
        dump_dict["mol list"] = self.model.to_dict()
        dump_dict["tempearture"] = self.temperature.as_au()
        dump_dict["total time"] = self.evolve_times[-1]
        dump_dict["other info"] = self.custom_dump_info
        dump_dict["r square array"] = self.r_square_array
        dump_dict["electron occupations array"] = self.e_occupations_array
        dump_dict["phonon occupations array"] = self.ph_occupations_array
        dump_dict["k occupations array"] = self.k_occupations_array
        dump_dict["eph entropy"] = self.eph_vn_entropy_array
        dump_dict["bond entropy"] = self.bond_vn_entropy_array
        dump_dict["coherent length array"] = self.coherent_length_array
        if self.reduced_density_matrices:
            dump_dict["reduced density matrices"] = self.reduced_density_matrices
        dump_dict["time series"] = list(self.evolve_times)
        return dump_dict

    def is_similar(self, other: "ChargeDiffusionDynamics", rtol=1e-3):
        all_close = partial(np.allclose, rtol=rtol, atol=1e-3)
        if len(self.evolve_times) != len(other.evolve_times):
            return False
        attrs = [
            "evolve_times", "r_square_array", "energies",
            "e_occupations_array", "ph_occupations_array",
            "coherent_length_array",
        ]
        return all(all_close(getattr(self, a), getattr(other, a)) for a in attrs)
