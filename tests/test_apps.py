"""Application-layer tests on tiny models with dense oracles."""

import numpy as np
import pytest

from fixtures import dense_hamiltonian, exact_model

from renormalizer_tpu import (
    BasisHalfSpin,
    BasisSHO,
    CompressConfig,
    CompressCriteria,
    EvolveConfig,
    EvolveMethod,
    Model,
    Mpo,
    Mps,
    Op,
    Quantity,
)
from renormalizer_tpu.model import HolsteinModel, Mol, Phonon




@pytest.mark.fast
def test_spectra_zerot():
    """Zero-T absorption autocorrelation vs dense oracle."""
    import scipy.linalg

    from renormalizer_tpu.spectra import SpectraOneWayPropZeroT, SpectraTwoWayPropZeroT

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.5), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    dt, nsteps = 0.2, 6

    job = SpectraTwoWayPropZeroT(model, "abs")
    job.evolve(dt, nsteps)
    autocorr = job.autocorr

    # dense oracle
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    # mu = sum_i dipole_i * a_i^dagger
    mu_terms = [Op(r"a^\dagger", dof, 1.0) for dof in model.e_dofs]
    mu = dense_hamiltonian(Model(model.basis, mu_terms))
    # ground state of the 0-exciton sector is the vacuum-phonon ground state
    w, v = np.linalg.eigh(h)
    qn = np.zeros(h.shape[0], dtype=int)
    for s in range(h.shape[0]):
        idx = np.unravel_index(s, dims)
        qn[s] = sum(model.basis[i].sigmaqn[idx[i]][0] for i in range(len(dims)))
    sector0 = np.nonzero(qn == 0)[0]
    h0 = h[np.ix_(sector0, sector0)]
    w0, v0 = np.linalg.eigh(h0)
    gs = np.zeros(h.shape[0])
    gs[sector0] = v0[:, 0]
    ket0 = mu @ gs
    # the job's autocorr is the unnormalized <mu gs| e^{-iHt} |mu gs>
    oracle = []
    for i in range(nsteps + 1):
        t = dt * i
        ket_t = scipy.linalg.expm(-1j * h * t) @ ket0
        oracle.append(ket0 @ ket_t)
    oracle = np.array(oracle)
    assert np.allclose(autocorr[: len(oracle)], oracle, atol=5e-3)


def test_spectra_exact_emi():
    """Exact-propagator zero-T emission: |C(0)| equals the squared norm of
    mu|gs> = 1 + 2 Re<a0^+ a1> (phonon-dressed coherence), and |C(t)| cannot
    grow."""
    from renormalizer_tpu.spectra import SpectraExact

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.5), 4)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.1))
    job = SpectraExact(model, "emi")
    job.evolve(0.2, 5)
    assert len(job.autocorr) == 6
    # oracle for C(0): <gs| mu^+ mu |gs> in the 1-exciton sector
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s1 = np.nonzero(qn == 1)[0]
    w1, v1 = np.linalg.eigh(h[np.ix_(s1, s1)])
    gs_vec = np.zeros(h.shape[0])
    gs_vec[s1] = v1[:, 0]
    mu = dense_hamiltonian(Model(model.basis, [Op("a", d, 1.0) for d in model.e_dofs]))
    norm2 = np.linalg.norm(mu @ gs_vec) ** 2
    assert np.isclose(abs(job.autocorr[0]), norm2, atol=1e-6)
    assert np.all(np.abs(job.autocorr) <= abs(job.autocorr[0]) + 1e-8)


def _local_phonon_hams(ph):
    """Dense GS/EX local phonon Hamiltonians as the exact propagator builds
    them (``Mpo.exact_propagator``)."""
    import scipy.linalg  # noqa: F401

    n = ph.pbond
    ladder = np.diag(np.sqrt(np.arange(1, n)), -1) + np.diag(np.sqrt(np.arange(1, n)), 1)
    h_gs = np.diag(ph.omega[0] * np.arange(n, dtype=float))
    h_ex = np.diag(ph.omega[0] * np.arange(n, dtype=float)) + ph.term10 * ladder
    return h_gs, h_ex


@pytest.mark.fast
@pytest.mark.parametrize("spectratype", ["emi", "abs"])
def test_spectra_exact_finite_t(spectratype):
    """Single-molecule finite-T exact spectra vs the dense thermal
    correlation function.  The reference gates this case off untested
    (``spectra/exact.py:40-42``); here it runs and is oracle-checked:
    C(t)/C(0) = prod_modes Tr[rho1 e^{iH1 t} e^{-iH2 t}] / Tr[rho1]."""
    import scipy.linalg

    from renormalizer_tpu.spectra import SpectraExact

    phs = [
        Phonon.simple_phonon(Quantity(1.0), Quantity(0.7), 8),
        Phonon.simple_phonon(Quantity(0.4), Quantity(1.1), 10),
    ]
    model = HolsteinModel([Mol(Quantity(1.0), phs, 1.0)], Quantity(0))
    temperature = Quantity(0.5)  # k_B T in a.u. -> beta = 2
    job = SpectraExact(model, spectratype, temperature=temperature)
    nsteps, dt = 8, 0.3
    job.evolve(dt, nsteps)
    ac = np.array(job.autocorr)
    ac = ac / ac[0]

    beta = temperature.to_beta()
    times = dt * np.arange(nsteps + 1)
    oracle = np.ones(nsteps + 1, dtype=complex)
    for ph in phs:
        h_gs, h_ex = _local_phonon_hams(ph)
        # thermal space / ket space per spectratype
        h1, h2 = (h_ex, h_gs) if spectratype == "emi" else (h_gs, h_ex)
        rho = scipy.linalg.expm(-beta * h1)
        rho /= np.trace(rho)
        oracle *= np.array([
            np.trace(rho @ scipy.linalg.expm(1j * h1 * t)
                     @ scipy.linalg.expm(-1j * h2 * t))
            for t in times
        ])
    assert np.allclose(ac, oracle, atol=1e-7)


@pytest.mark.fast
def test_spectra_exact_shift():
    """gs_shift adds a pure phase e^{-i s t} to the zero-T emission
    correlation (the reference asserts shifts off untested)."""
    from renormalizer_tpu.spectra import SpectraExact

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.5), 4)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.1))
    shift = 0.37
    nsteps, dt = 5, 0.2
    job0 = SpectraExact(model, "emi")
    job0.evolve(dt, nsteps)
    jobs = SpectraExact(model, "emi", gs_shift=shift)
    jobs.evolve(dt, nsteps)
    times = dt * np.arange(nsteps + 1)
    expected = np.array(job0.autocorr) * np.exp(-1j * shift * times)
    assert np.allclose(np.array(jobs.autocorr), expected, atol=1e-8)


def test_sbm_dynamics():
    """Unbiased spin-boson: sigma_z decays from 1; cross-check vs dense."""
    import scipy.linalg

    from renormalizer_tpu.sbm import SpinBosonDynamics
    from renormalizer_tpu.model import SpinBosonModel

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.5), 2)
    model = SpinBosonModel(Quantity(0.0), Quantity(0.5), [ph])
    job = SpinBosonDynamics(model, compress_config=CompressConfig(CompressCriteria.fixed))
    dt, nsteps = 0.2, 5
    job.evolve(dt, nsteps)

    h = dense_hamiltonian(model)
    sz = dense_hamiltonian(Model(model.basis, [Op("sigma_z", "spin")]))
    psi0 = np.zeros(h.shape[0])
    psi0[0] = 1  # spin up, phonon vacuum
    oracle = []
    for i in range(nsteps + 1):
        psit = scipy.linalg.expm(-1j * h * dt * i) @ psi0
        oracle.append(np.real(psit.conj() @ sz @ psit))
    assert np.allclose(job.sigma_z, oracle, atol=1e-3)


def test_vibronic_dynamics():
    """2-state 1-mode vibronic model autocorrelation vs dense."""
    import scipy.linalg

    from renormalizer_tpu.vibronic import VibronicModelDynamics

    basis = [BasisHalfSpin("e"), BasisSHO("v", 1.0, 4)]
    terms = (
        Op("sigma_z", "e", 0.5)
        + Op("p^2", "v", 0.5) + Op("x^2", "v", 0.5)
        + Op("sigma_x", "e") * Op("x", "v") * 0.2
    )
    model = Model(basis, terms)
    job = VibronicModelDynamics(model, init_condition={"e": 0, "v": 0})
    dt, nsteps = 0.2, 4
    job.evolve(dt, nsteps)

    h = dense_hamiltonian(model)
    psi0 = np.zeros(h.shape[0])
    psi0[0] = 1
    # autocorrelation at 2t via the real-initial-state trick
    for t, ac in zip(job.autocorr_time, job.autocorr_array):
        psit = scipy.linalg.expm(-1j * h * t) @ psi0
        assert np.isclose(psi0 @ psit, ac, atol=1e-3)


@pytest.mark.fast
def test_vscf():
    """VSCF on a decoupled pair of oscillators gives exact energies."""
    from renormalizer_tpu.vibration import Vscf

    basis = [BasisSHO("v0", 1.0, 8), BasisSHO("v1", 0.5, 8)]
    terms = (
        Op("p^2", "v0", 0.5) + Op("x^2", "v0", 0.5)
        + Op("p^2", "v1", 0.5) + Op("x^2", "v1", 0.5 * 0.25)
    )
    model = Model(basis, terms)
    scf = Vscf(model)
    scf.kernel(nsweeps=5)
    # modal energies of site 0 are (n + 1/2) * 1 + zpe of the other mode
    e0 = np.asarray(scf.e[0])
    gaps = np.diff(e0[:4])
    assert np.allclose(gaps, 1.0, atol=1e-6)
    e1 = np.asarray(scf.e[1])
    assert np.allclose(np.diff(e1[:4]), 0.5, atol=1e-6)


def test_tda():
    """TDA excitation energies vs dense spectrum of the 1-exciton sector."""
    from renormalizer_tpu.mps import TDA
    from renormalizer_tpu.mps.gs import construct_mps_mpo, optimize_mps

    model = exact_model()
    mps, mpo = construct_mps_mpo(model, 16, 1)
    mps.optimize_config.procedure = [[8, 0.4], [16, 0.2], [16, 0], [16, 0]]
    energies, mps_opt = optimize_mps(mps.copy(), mpo)

    tda = TDA(model, mpo, mps_opt, nroots=3)
    e = tda.kernel()

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sector = np.nonzero(qn == 1)[0]
    w = np.linalg.eigvalsh(h[np.ix_(sector, sector)])
    # the first TDA roots approximate the low-lying excited states
    assert np.allclose(e[:2], w[1:3], atol=2e-3)


def test_transport_spectral_function():
    """G_ij(0) = delta_{ij} for the free-electron TI1D model."""
    from renormalizer_tpu.model import TI1DModel
    from renormalizer_tpu.transport import SpectralFunctionZT
    from renormalizer_tpu.model.basis import BasisSimpleElectron

    basis = [BasisSimpleElectron("e")]
    local = []
    nonlocal_terms = Op(r"a^\dagger a", [(0, "e"), (1, "e")], -1.0) + Op(
        r"a^\dagger a", [(1, "e"), (0, "e")], -1.0
    )
    model = TI1DModel(basis, local, nonlocal_terms, 4)
    job = SpectralFunctionZT(model)
    job.evolve(0.1, 2)
    G0 = job.G_array[0]
    assert np.isclose(G0[0] * 1j, 1, atol=1e-6)
    assert np.allclose(np.abs(G0[1:]), 0, atol=1e-6)


@pytest.mark.fast
def test_cv_zerot():
    """DDMRG correction vector at two frequencies vs the dense Lorentzian
    oracle -1/pi Im <0|mu (H-E0-w-i eta)^-1 mu|0>."""
    from renormalizer_tpu.cv import SpectraZtCV

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.4), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    eta = 0.05
    cv = SpectraZtCV(model, "abs", m_max=16, eta=eta,
                     procedure_cv=[0.4, 0.2, 0.1, 0] + [0] * 10)
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    mu = dense_hamiltonian(
        Model(model.basis, [Op(r"a^\dagger", d, 1.0) for d in model.e_dofs])
    )
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s0 = np.nonzero(qn == 0)[0]
    w0, v0 = np.linalg.eigh(h[np.ix_(s0, s0)])
    gs_vec = np.zeros(h.shape[0])
    gs_vec[s0] = v0[:, 0]
    ket = mu @ gs_vec
    for omega in (1.05, 1.5):
        res = cv.cv_solve(omega)
        A = h - (w0[0] + omega) * np.eye(h.shape[0]) + 1j * eta * np.eye(h.shape[0])
        x = np.linalg.solve(A, ket)
        oracle = -1 / np.pi * np.imag(ket @ x)
        assert abs(res - oracle) / abs(oracle) < 1e-3


@pytest.mark.parametrize("spectratype", ["abs", "emi"])
def test_cv_finitet(spectratype):
    """Finite-T DDMRG correction vector vs the dense Liouville-space
    Lorentzian oracle (eta/pi) sum_ij |B_ij|^2 / ((w-(E_i-E_j))^2+eta^2),
    B = V^T mu rho(beta/2) V."""
    import scipy.linalg
    from renormalizer_tpu.cv import SpectraFtCV

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.4), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    eta = 0.05
    temperature = Quantity(0.5, "a.u.")
    beta = temperature.to_beta()
    if spectratype == "abs":
        cv = SpectraFtCV(model, "abs", m_max=16, eta=eta, temperature=temperature,
                         procedure_cv=[0.4, 0.2, 0.1, 0] + [0] * 10)
        op, sector, freqs = r"a^\dagger", 0, (1.05, 1.5)
    else:
        cv = SpectraFtCV(model, "emi", m_max=16, eta=eta, temperature=temperature,
                         insteps=50, procedure_cv=[0.4, 0.2, 0.1, 0] + [0] * 10)
        op, sector, freqs = "a", 1, (-1.05, -1.5)

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    mu = dense_hamiltonian(Model(model.basis, [Op(op, d, 1.0) for d in model.e_dofs]))
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sidx = np.nonzero(qn == sector)[0]
    rho = np.zeros_like(h)
    rho[np.ix_(sidx, sidx)] = scipy.linalg.expm(-beta / 2 * h[np.ix_(sidx, sidx)])
    rho /= np.linalg.norm(rho)
    E, V = np.linalg.eigh(h)
    B = V.T @ (mu @ rho) @ V
    gaps = E[:, None] - E[None, :]
    for omega in freqs:
        res = cv.cv_solve(omega)
        oracle = eta / np.pi * np.sum(np.abs(B) ** 2 / ((omega - gaps) ** 2 + eta ** 2))
        assert abs(res - oracle) / abs(oracle) < 1e-4


@pytest.mark.fast
def test_cv_finitet_2site():
    """2-site finite-T DDMRG.  The reference carries this branch but leaves
    it unrunnable (``/root/reference/renormalizer/cv/finitet.py:712-714``
    raises "too expensive ... I drop it"); here it runs, so test it harder
    than the reference tests 1site: against the dense Liouville-space oracle
    AND against the 1site solve at matched omega."""
    import scipy.linalg
    from renormalizer_tpu.cv import SpectraFtCV

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.4), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    eta = 0.05
    temperature = Quantity(0.5, "a.u.")
    beta = temperature.to_beta()
    procedure = [0.4, 0.2, 0.1, 0] + [0] * 10

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    mu = dense_hamiltonian(Model(model.basis, [Op(r"a^\dagger", d, 1.0) for d in model.e_dofs]))
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sidx = np.nonzero(qn == 0)[0]
    rho = np.zeros_like(h)
    rho[np.ix_(sidx, sidx)] = scipy.linalg.expm(-beta / 2 * h[np.ix_(sidx, sidx)])
    rho /= np.linalg.norm(rho)
    E, V = np.linalg.eigh(h)
    B = V.T @ (mu @ rho) @ V
    gaps = E[:, None] - E[None, :]

    cv2 = SpectraFtCV(model, "abs", m_max=16, eta=eta, temperature=temperature,
                      method="2site", procedure_cv=procedure)
    cv1 = SpectraFtCV(model, "abs", m_max=16, eta=eta, temperature=temperature,
                      method="1site", procedure_cv=procedure)
    for omega in (1.05, 1.5):
        res2 = cv2.cv_solve(omega)
        oracle = eta / np.pi * np.sum(np.abs(B) ** 2 / ((omega - gaps) ** 2 + eta ** 2))
        assert abs(res2 - oracle) / abs(oracle) < 1e-4
        res1 = cv1.cv_solve(omega)
        assert abs(res2 - res1) / abs(res1) < 1e-4


def test_transition_expectation():
    """<bra|O|ket> with bra != ket and differing bond dimensions (regression:
    the final contraction used to flip the bra/ket environment axes)."""
    model = exact_model()
    mpo = Mpo(model)
    a = Mps.random(model, 1, 8)
    b = (mpo @ a).canonicalise().compress(temp_m_trunc=6)
    raw = a.expectation(mpo, b.conj())
    dense = b.todense().ravel().conj() @ mpo.todense() @ a.todense().ravel()
    assert abs(raw - dense) < 1e-10


def test_transport_kubo():
    """Finite-T current-current correlation vs the dense Liouville oracle
    (protocol mirrors reference ``transport/tests/test_kubo.py:21-34``)."""
    import scipy.linalg
    from renormalizer_tpu.transport import TransportKubo

    ph = Phonon.simple_phonon(Quantity(1), Quantity(1), 2)
    model = HolsteinModel([Mol(Quantity(0), [ph])] * 5, Quantity(1), 3)
    temperature = Quantity(50000, "K")
    kubo = TransportKubo(
        model, temperature,
        compress_config=CompressConfig(CompressCriteria.fixed, max_bonddim=24),
        ievolve_config=EvolveConfig(EvolveMethod.tdvp_ps, adaptive=True, guess_dt=-0.1j),
        evolve_config=EvolveConfig(EvolveMethod.tdvp_ps, adaptive=True, guess_dt=0.5,
                                   adaptive_rtol=1e-3),
    )
    kubo.evolve(nsteps=5, evolve_time=5)

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s1 = np.nonzero(qn == 1)[0]
    H1 = h[np.ix_(s1, s1)]
    J = 1.0
    e_dofs = model.e_dofs
    terms = []
    for i in range(len(e_dofs) - 1):
        terms.append(Op(r"a^\dagger a", [e_dofs[i], e_dofs[i + 1]], factor=J))
        terms.append(Op(r"a^\dagger a", [e_dofs[i + 1], e_dofs[i]], factor=-J))
    j_dense = dense_hamiltonian(Model(model.basis, terms))[np.ix_(s1, s1)]
    beta = temperature.to_beta()
    rho = scipy.linalg.expm(-beta * H1)
    rho /= np.trace(rho)
    E, V = np.linalg.eigh(H1)
    rho_e = V.T @ rho @ V
    j_e = V.T @ j_dense @ V
    oracle = []
    for t in kubo.evolve_times_array:
        ph_t = np.exp(1j * E * t)
        j_t = (ph_t[:, None] * j_e) * np.conj(ph_t)[None, :]
        oracle.append(-np.trace(rho_e @ j_t @ j_e))
    assert np.allclose(kubo.auto_corr, np.array(oracle), rtol=5e-2)


def test_transport_band_limit():
    """Free-electron charge diffusion: r^2(t) = 2 J^2 t^2
    (protocol mirrors reference ``transport/tests/test_dynamics.py:24-40``)."""
    from renormalizer_tpu.transport import ChargeDiffusionDynamics, EDGE_THRESHOLD

    mol_num = 13
    ph_list = [Phonon.simple_phonon(Quantity(1e-10, "cm-1"), Quantity(1e-10, "a.u."), 4)]
    j_constant = Quantity(0.8, "eV")
    model = HolsteinModel([Mol(Quantity(0), ph_list)] * mol_num, j_constant, 3)
    ct = ChargeDiffusionDynamics(
        model, evolve_config=EvolveConfig(EvolveMethod.prop_and_compress)
    )
    ct.stop_at_edge = True
    ct.evolve(4, 25)
    assert EDGE_THRESHOLD < ct.latest_mps.e_occupations[0] < 0.1
    analytical = 2 * j_constant.as_au() ** 2 * ct.evolve_times_array ** 2
    m = analytical > 0
    assert np.allclose(np.asarray(ct.r_square_array)[m], analytical[m], rtol=1e-3)


def test_spectra_finitet_abs():
    """Finite-T time-domain absorption autocorrelation vs the dense oracle
    with matching operator ordering: odd steps evolve the ket as
    U K U_gs^ancilla, even steps the bra (two-way propagation with exact
    GS-space counter-evolution on the ancilla legs)."""
    import scipy.linalg
    from renormalizer_tpu.spectra import SpectraFiniteT

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.4), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    temperature = Quantity(0.2, "a.u.")
    job = SpectraFiniteT(model, "abs", temperature, 20, Quantity(0),
                         evolve_config=EvolveConfig(EvolveMethod.tdvp_ps))
    dt, n = 0.4, 5
    job.evolve(evolve_dt=dt, nsteps=n)
    ac = np.asarray(job.autocorr)

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s0 = np.nonzero(qn == 0)[0]
    beta = temperature.to_beta()
    rho_h = np.zeros_like(h)
    rho_h[np.ix_(s0, s0)] = scipy.linalg.expm(-beta / 2 * h[np.ix_(s0, s0)])
    rho_h /= np.linalg.norm(rho_h)
    mu = dense_hamiltonian(Model(model.basis, [Op(r"a^\dagger", d, 1.0) for d in model.e_dofs]))
    hph = dense_hamiltonian(Model(model.basis, [Op(r"b^\dagger b", d, 1.0) for d in model.v_dofs]))
    U = scipy.linalg.expm(-1j * h * dt)
    Ugs = scipy.linalg.expm(1j * hph * dt)
    K = (mu @ rho_h).astype(complex)
    B = K.copy()
    oracle = [np.trace(B.conj().T @ K)]
    for i in range(1, n + 1):
        if i % 2 == 1:
            K = U @ K @ Ugs
        else:
            B = U.conj().T @ B @ Ugs.conj().T
        oracle.append(np.trace(B.conj().T @ K))
    assert np.abs(ac - np.array(oracle)).max() < 1e-8


def test_property_thermal_equilibrium():
    """Property collection during imaginary-time evolution: electron RDM and
    e-ph static correlation vs the dense thermal ensemble
    (protocol mirrors reference ``property/tests/test_polaron_structure.py``)."""
    import scipy.linalg
    from renormalizer_tpu.mps import MpDm, ThermalProp
    from renormalizer_tpu.property import Property, ops as prop_ops

    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.6), 3)
    model = HolsteinModel([Mol(Quantity(0.0), [ph], 1.0)] * 3, Quantity(0.1))
    prop_mpos = {}
    for imol in range(3):
        prop_mpos.update(prop_ops.e_ph_static_correlation(model, imol=imol))
    prop = Property(list(prop_mpos.keys()) + ["e_rdm"], prop_mpos)
    beta = Quantity(1500.0, "K").to_beta()
    mpdm = MpDm.max_entangled_ex(model)
    td = ThermalProp(mpdm, evolve_config=EvolveConfig(EvolveMethod.tdvp_ps),
                     properties=prop)
    td.evolve(None, 10, beta / 2j)

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s1 = np.nonzero(qn == 1)[0]
    rho = scipy.linalg.expm(-beta * h[np.ix_(s1, s1)])
    rho /= np.trace(rho)

    rdm_c = np.asarray(prop.prop_res["e_rdm"][-1])
    # the thermal-equilibrium RDM is real up to roundoff; cast explicitly
    # so an actual phase bug cannot hide in a silent complex->real cast
    assert np.abs(rdm_c.imag).max() < 1e-6
    rdm = rdm_c.real.astype(float)
    rdm_d = np.zeros((3, 3))
    for i, di in enumerate(model.e_dofs):
        for j, dj in enumerate(model.e_dofs):
            o = dense_hamiltonian(
                Model(model.basis, [Op(r"a^\dagger a", [di, dj], 1.0)])
            )[np.ix_(s1, s1)]
            rdm_d[i, j] = float(np.real(np.trace(rho @ o)))
    assert np.abs(rdm - rdm_d).max() < 1e-4

    for key, mpo in prop_mpos.items():
        od = np.asarray(mpo.todense())[np.ix_(s1, s1)]
        oracle = float(np.real(np.trace(rho @ od)))
        val = float(np.real(complex(np.asarray(prop.prop_res[key][-1]))))
        assert abs(val - oracle) < 1e-4, key
