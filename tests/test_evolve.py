"""Time evolution oracle tests: every evolution scheme vs dense
``scipy.linalg.expm`` on the tiny exactly-solvable Holstein model.

Mirrors the reference strategy (``renormalizer/mps/tests/test_evolve.py``)
with the qutip oracle replaced by a kron-assembled dense Hamiltonian.
"""

import numpy as np
import pytest
import scipy.linalg

from fixtures import dense_hamiltonian, exact_model

from renormalizer_tpu import Mps, Mpo, Op, EvolveConfig, EvolveMethod
from renormalizer_tpu.mps import MpDm, ThermalProp


def _e_occ_oracle(model, psi0, times):
    h = dense_hamiltonian(model)
    occ_ops = []
    for dof in model.e_dofs:
        from renormalizer_tpu.model import Model

        occ_ops.append(dense_hamiltonian(Model(model.basis, [Op(r"a^\dagger a", dof)])))
    res = []
    for t in times:
        psit = scipy.linalg.expm(-1j * h * t) @ psi0
        res.append([np.real(psit.conj() @ o @ psit) for o in occ_ops])
    return np.array(res)


EVOLVE_CONFIGS = [
    EvolveConfig(EvolveMethod.prop_and_compress, adaptive=True, guess_dt=0.1),
    EvolveConfig(EvolveMethod.prop_and_compress_tdrk4),
    EvolveConfig(EvolveMethod.prop_and_compress_tdrk),
    EvolveConfig(EvolveMethod.tdvp_ps),
    EvolveConfig(EvolveMethod.tdvp_ps2),
    EvolveConfig(EvolveMethod.tdvp_mu_vmf, ivp_rtol=1e-6, ivp_atol=1e-9, force_ovlp=False),
    EvolveConfig(EvolveMethod.tdvp_vmf, ivp_rtol=1e-6, ivp_atol=1e-9, force_ovlp=False),
    EvolveConfig(EvolveMethod.tdvp_mu_cmf),
]


@pytest.mark.parametrize("evolve_config", EVOLVE_CONFIGS, ids=lambda c: c.method.name)
def test_evolve_schemes(evolve_config):
    model = exact_model()
    mpo = Mpo(model)
    # initial state: electron on site 0
    init = Mps.hartree_product_state(model, condition={0: 1})
    init = init.expand_bond_dimension(hint_mpo=mpo, include_ex=False)
    init.evolve_config = evolve_config

    nsteps, dt = 5, 4.0
    psi0 = init.todense().astype(complex)
    oracle = _e_occ_oracle(model, psi0, dt * np.arange(1, nsteps + 1))

    mps = init
    deviations = []
    for i in range(nsteps):
        mps = mps.evolve(mpo, dt)
        deviations.append(np.abs(mps.e_occupations - oracle[i]).mean())
    # same criterion as the reference: mean cumulative deviation < 1e-4
    assert np.mean(deviations) < 1e-4


def test_mpdm_evolve():
    """Finite-temperature machinery: MpDm real-time evolution matches the
    pure-state result when initialized from a pure state."""
    model = exact_model()
    mpo = Mpo(model)
    init_mps = Mps.hartree_product_state(model, condition={0: 1})
    mpdm = MpDm.from_mps(init_mps)
    mpdm = mpdm.expand_bond_dimension(hint_mpo=mpo, include_ex=False)
    mpdm.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)

    psi0 = init_mps.todense().astype(complex)
    nsteps, dt = 3, 4.0
    oracle = _e_occ_oracle(model, psi0, dt * np.arange(1, nsteps + 1))
    deviations = []
    for i in range(nsteps):
        mpdm = mpdm.evolve(mpo, dt)
        deviations.append(np.abs(mpdm.e_occupations - oracle[i]).mean())
    assert np.mean(deviations) < 1e-4


def test_thermal_prop_exact():
    """Imaginary-time exact propagation in GS space: the thermal state of
    decoupled oscillators has analytic occupations."""
    from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
    from renormalizer_tpu.utils import Quantity

    omega = 0.01
    ph = Phonon.simple_phonon(Quantity(omega), Quantity(0), 10)
    model = HolsteinModel([Mol(Quantity(0), [ph])] * 2, Quantity(0))
    mpdm = MpDm.max_entangled_gs(model)
    beta = 20.0
    tp = ThermalProp(mpdm, exact=True, space="GS")
    tp.evolve(evolve_dt=-0.5j * beta, nsteps=1)
    thermal = tp.latest_mps
    occ = thermal.ph_occupations
    n_exact = 1 / (np.exp(beta * omega) - 1)
    assert np.allclose(occ, n_exact, atol=1e-4)
