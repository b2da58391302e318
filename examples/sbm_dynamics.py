"""Spin-boson model dynamics: sigma_z(t) for an Ohmic bath.

Run: python examples/sbm_dynamics.py
"""
from renormalizer_tpu.sbm import SpinBosonDynamics, param2mollist
from renormalizer_tpu.utils import Quantity, EvolveConfig, EvolveMethod

model = param2mollist(
    alpha=0.05, raw_delta=Quantity(1), omega_c=Quantity(5),
    renormalization_p=1.5, n_phonons=8,
)
sbm = SpinBosonDynamics(model, evolve_config=EvolveConfig(EvolveMethod.tdvp_ps))
sbm.evolve(evolve_dt=0.2, nsteps=20)
print("sigma_z(t):", sbm.sigma_z)
