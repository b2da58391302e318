"""Time evolution oracle tests: evolution schemes vs dense
``scipy.linalg.expm`` on the tiny exactly-solvable Holstein model.

Protocol mirrors the reference (``renormalizer/mps/tests/test_evolve.py``):
initial state a^dagger_0 |gs>, Hamiltonian MPO offset by the initial energy,
time step 0.2, mean cumulative deviation of electronic occupations < 1e-4.
The qutip oracle is replaced by a kron-assembled dense Hamiltonian.
"""

import numpy as np
import pytest
import scipy.linalg

from fixtures import dense_hamiltonian, exact_model

from renormalizer_tpu import (
    CompressConfig,
    CompressCriteria,
    EvolveConfig,
    EvolveMethod,
    Mpo,
    Mps,
    Quantity,
)
from renormalizer_tpu.model import Model
from renormalizer_tpu.mps import MpDm, ThermalProp

model = exact_model()
H_DENSE = dense_hamiltonian(model)
OCC_DENSE = [
    dense_hamiltonian(Model(model.basis, [__import__("renormalizer_tpu").Op(r"a^\dagger a", dof)]))
    for dof in model.e_dofs
]


def _make_init():
    tentative_mpo = Mpo(model)
    init_mps = Mpo.onsite(model, r"a^\dagger", dof_set=[0]) @ Mps.ground_state(model, False)
    init_mps = init_mps.expand_bond_dimension(hint_mpo=tentative_mpo)
    e = init_mps.expectation(tentative_mpo)
    mpo = Mpo(model, offset=Quantity(e))
    return init_mps, mpo, e


INIT_MPS, MPO, E0 = _make_init()


def _oracle(psi0, times, e0):
    h = H_DENSE - e0 * np.eye(H_DENSE.shape[0])
    res = []
    for t in times:
        psit = scipy.linalg.expm(-1j * h * t) @ psi0
        res.append([np.real(psit.conj() @ o @ psit) for o in OCC_DENSE])
    return np.array(res)


def check_result(mps, mpo, time_step, final_time, atol=1e-4):
    nsteps = round(final_time / time_step)
    psi0 = INIT_MPS.todense().astype(complex)
    oracle = _oracle(psi0, time_step * np.arange(1, nsteps + 1), E0)
    deviations = []
    for i in range(nsteps):
        mps = mps.evolve(mpo, time_step)
        deviations.append(np.abs(np.array(mps.e_occupations) - oracle[i]).mean())
    mcd = float(np.mean(deviations))
    assert mcd < atol, f"mean cumulated deviation {mcd}"
    return mps


@pytest.mark.fast
def test_pc():
    mps = INIT_MPS.copy()
    mps.compress_config = CompressConfig(CompressCriteria.fixed)
    check_result(mps, MPO, 0.2, 2)


def test_pc_adaptive():
    mps = INIT_MPS.copy()
    mps.compress_config = CompressConfig(CompressCriteria.fixed)
    mps.evolve_config = EvolveConfig(EvolveMethod.prop_and_compress, adaptive=True, guess_dt=0.2)
    check_result(mps, MPO, 1.0, 2)


def test_pc_tdrk4():
    mps = INIT_MPS.copy()
    mps.compress_config = CompressConfig(CompressCriteria.fixed)
    mps.evolve_config = EvolveConfig(EvolveMethod.prop_and_compress_tdrk4)
    check_result(mps, MPO, 0.2, 2)


def test_pc_tdrk():
    mps = INIT_MPS.copy()
    mps.compress_config = CompressConfig(CompressCriteria.fixed)
    mps.evolve_config = EvolveConfig(EvolveMethod.prop_and_compress_tdrk)
    check_result(mps, MPO, 0.2, 2)


@pytest.mark.fast
def test_tdvp_ps():
    mps = INIT_MPS.copy()
    mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
    check_result(mps, MPO, 0.2, 2)


def test_tdvp_ps2():
    mps = INIT_MPS.copy()
    mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps2)
    # bond-adaptive truncation threshold tightened so the splitting error
    # (not the truncation error) dominates
    mps.compress_config = CompressConfig(threshold=1e-6)
    check_result(mps, MPO, 0.2, 2)


def test_tdvp_vmf():
    mps = INIT_MPS.copy()
    mps.evolve_config = EvolveConfig(
        EvolveMethod.tdvp_mu_vmf, ivp_rtol=1e-4, ivp_atol=1e-7, force_ovlp=False
    )
    mps.evolve_config.vmf_auto_switch = False
    check_result(mps, MPO, 1.0, 1)


def test_tdvp_cmf():
    mps = INIT_MPS.copy()
    # CMF requires small time steps (the reference's own test uses dt=0.01,
    # ``renormalizer/mps/tests/test_evolve.py:115-121``)
    mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_mu_cmf)
    check_result(mps, MPO, 0.02, 0.06, atol=5e-4)


def test_mpdm_evolve():
    """MpDm real-time evolution from a pure state matches pure-state
    occupations."""
    mpdm = MpDm.from_mps(INIT_MPS.copy())
    mpdm = mpdm.expand_bond_dimension(hint_mpo=Mpo(model))
    mpdm.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
    check_result(mpdm, MPO, 0.4, 1.2)


@pytest.mark.fast
def test_thermal_prop_exact():
    """Imaginary-time exact propagation in GS space: thermal occupation of a
    decoupled oscillator is analytic."""
    from renormalizer_tpu.model import HolsteinModel, Mol, Phonon

    omega = 0.01
    ph = Phonon.simple_phonon(Quantity(omega), Quantity(0), 10)
    model2 = HolsteinModel([Mol(Quantity(0), [ph])] * 2, Quantity(0))
    mpdm = MpDm.max_entangled_gs(model2)
    beta = 20.0
    tp = ThermalProp(mpdm, exact=True, space="GS")
    tp.evolve(evolve_dt=-0.5j * beta, nsteps=1)
    thermal = tp.latest_mps
    occ = thermal.ph_occupations
    # truncated-oscillator thermal occupation (pdim=10 levels)
    n = np.arange(10)
    w = np.exp(-beta * omega * n)
    n_exact = (n * w).sum() / w.sum()
    assert np.allclose(occ, n_exact, atol=1e-4)


def test_crash_dump(tmp_path):
    """A failing evolution step dumps the last good state before raising."""
    import os
    from renormalizer_tpu.mps import MpDm, ThermalProp

    mpdm = MpDm.max_entangled_ex(model)
    tp = ThermalProp(mpdm, evolve_config=EvolveConfig(EvolveMethod.tdvp_ps),
                     dump_dir=str(tmp_path), job_name="boom")
    orig = tp.evolve_single_step
    calls = [0]

    def bad(dt):
        calls[0] += 1
        if calls[0] == 3:
            raise RuntimeError("synthetic OOM")
        return orig(dt)

    tp.evolve_single_step = bad
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        tp.evolve(None, 5, 2.0 / 2j)
    assert os.path.exists(tmp_path / "boom_crash.npz")


@pytest.mark.fast
def test_tdvp_ps_fused_qn(monkeypatch):
    """The round-5 qn-structured fused site update (one dispatch per site,
    static block masks, bond qn provably unchanged) must match both the
    dense oracle and the unfused qn-blocked QR path bit-for-bit shapes and
    to fp64 accuracy in values."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    mps = INIT_MPS.copy()
    mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
    fused = check_result(mps, MPO, 0.2, 2)

    monkeypatch.setenv("RENO_TDVP_FUSED_QN", "0")
    mps2 = INIT_MPS.copy()
    mps2.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
    unfused = check_result(mps2, MPO, 0.2, 2)

    # same physical state: overlap magnitude 1 and matching qn bookkeeping
    # (bond-state ORDER is gauge: the unfused path sector-sorts each bond,
    # the fused path preserves the incoming order — compare as multisets)
    ovlp = abs(complex(fused.dot(unfused.conj()))) / (
        fused.mp_norm * unfused.mp_norm
    )
    assert abs(ovlp - 1) < 1e-8, ovlp
    for q1, q2 in zip(fused.qn, unfused.qn):
        a = np.sort(np.asarray(q1), axis=0)
        b = np.sort(np.asarray(q2), axis=0)
        assert np.array_equal(a, b), (q1, q2)
