r"""Imaginary-time propagation of density matrices.

Reference ``renormalizer/mps/thermalprop.py:13-168``.

NOTICE: this module is deliberately a structural port of the reference
driver for API parity — it is thin host-side orchestration; all device
work happens in the engine layers (mps/, ops/, lib/), which are
TPU-first redesigns.
"""

import logging

import numpy as np

from renormalizer_tpu.model import Model
from renormalizer_tpu.mps.mpdm import MpDm
from renormalizer_tpu.mps.mpo import Mpo
from renormalizer_tpu.utils import EvolveConfig, Quantity, TdMpsJob

logger = logging.getLogger(__name__)


class ThermalProp(TdMpsJob):
    r"""Propagate an :class:`MpDm` in imaginary time (beta/2 splitting is the
    caller's responsibility).

    Args:
        init_mpdm: the initial density matrix, usually identity-like.
        h_mpo_model: model for the Hamiltonian MPO; defaults to
            ``init_mpdm.model``.
        exact: propagate with the exact local propagator (assumes local H).
        space: "GS" (zero-exciton) or "EX" (one-exciton) exact space.
        properties: optional :class:`~renormalizer_tpu.property.Property`.
    """

    def __init__(
        self,
        init_mpdm: MpDm,
        h_mpo_model: Model = None,
        exact: bool = False,
        space: str = "GS",
        evolve_config: EvolveConfig = None,
        dump_mps: str = None,
        dump_dir: str = None,
        job_name: str = None,
        properties=None,
        auto_expand: bool = True,
    ):
        self.init_mpdm: MpDm = init_mpdm.canonicalise()
        if h_mpo_model is None:
            h_mpo_model = self.init_mpdm.model
        self.h_mpo = Mpo(h_mpo_model)
        logger.info(f"Bond dim of h_mpo: {self.h_mpo.bond_dims}")
        self.exact = exact
        assert space in ("GS", "EX")
        self.space = space
        self.energies = []
        self._e_occupations_array = []
        self._ph_occupations_array = []
        self._vn_entropy_array = []
        self.properties = properties
        self.auto_expand = auto_expand
        super().__init__(
            evolve_config=evolve_config, dump_mps=dump_mps,
            dump_dir=dump_dir, job_name=job_name,
        )

    def init_mps(self):
        self.init_mpdm.evolve_config = self.evolve_config
        if self.evolve_config.is_tdvp and self.auto_expand:
            self.init_mpdm = self.init_mpdm.expand_bond_dimension(self.h_mpo)
        return self.init_mpdm

    def process_mps(self, mps):
        new_energy = mps.expectation(self.h_mpo)
        self.energies.append(new_energy)
        if self.exact:
            return
        for attr_str in ("e_occupations", "ph_occupations"):
            attr = getattr(mps, attr_str)
            logger.info(f"{attr_str}: {attr}")
            getattr(self, f"_{attr_str}_array").append(attr)
        vn_entropy = mps.calc_bond_entropy()
        self._vn_entropy_array.append(vn_entropy)
        logger.info(
            f"Energy: {new_energy}, total electron: "
            f"{self._e_occupations_array[-1].sum()}"
        )
        if self.properties is not None:
            self.properties.calc_properties(mps)

    def evolve_exact(self, old_mpdm: MpDm, evolve_dt):
        MPOprop = Mpo.exact_propagator(
            old_mpdm.model, evolve_dt.imag, space=self.space, shift=-self.energies[-1]
        )
        new_mpdm = MPOprop.apply(old_mpdm, canonicalise=True)
        # the partition function overflows even float128; normalize each step
        new_mpdm.normalize("mps_and_coeff")
        return new_mpdm

    def evolve_prop(self, old_mpdm, evolve_dt):
        h_mpo = Mpo(self.h_mpo.model, offset=Quantity(self.energies[-1]))
        return old_mpdm.evolve(h_mpo, evolve_dt)

    def evolve_single_step(self, evolve_dt):
        old_mpdm = self.latest_mps
        if self.exact:
            return self.evolve_exact(old_mpdm, evolve_dt)
        return self.evolve_prop(old_mpdm, evolve_dt)

    def evolve(self, evolve_dt=None, nsteps=None, evolve_time=None):
        """Imaginary-time evolution demands negative-imaginary dt
        (reference ``thermalprop.py:117-122``)."""
        if evolve_dt is not None:
            assert np.iscomplex(evolve_dt) and evolve_dt.imag < 0
        if evolve_time is not None:
            assert np.iscomplex(evolve_time) and evolve_time.imag < 0
        super().evolve(evolve_dt, nsteps, evolve_time)

    @property
    def e_occupations_array(self):
        return np.array(self._e_occupations_array)

    @property
    def ph_occupations_array(self):
        return np.array(self._ph_occupations_array)

    @property
    def vn_entropy_array(self):
        return np.array(self._vn_entropy_array)

    def get_dump_dict(self):
        dump_dict = {
            "time series": [-t.imag for t in self.evolve_times],
            "energies": self.energies,
            "electron occupations array": self.e_occupations_array.tolist(),
            "phonon occupations array": self.ph_occupations_array.tolist(),
            "vn entropy array": self.vn_entropy_array.tolist(),
        }
        if self.properties is not None:
            for prop_str, res in self.properties.prop_res.items():
                dump_dict[prop_str] = res
        return dump_dict


def load_thermal_state(model, path: str):
    """Load a cached thermal state; None if missing
    (reference ``thermalprop.py:151-168``)."""
    try:
        logger.info(f"Try load from {path}")
        mpdm = MpDm.load(model, path)
        logger.info(f"Init mpdm loaded: {mpdm}")
    except FileNotFoundError:
        logger.info(f"No file found in {path}")
        mpdm = None
    return mpdm
