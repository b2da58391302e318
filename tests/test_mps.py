"""MPS engine tests: MPO compilation vs dense oracles, canonicalization,
compression, expectation values, DMRG ground state.

Oracle strategy follows the reference test pyramid (SURVEY.md §4): dense
exact diagonalization on tiny models + scalar regression values.
"""

import numpy as np
import pytest

from fixtures import dense_hamiltonian, exact_model, holstein_model, GS_E

from renormalizer_tpu import Mps, Mpo, Op, Model, BasisHalfSpin, Quantity
from renormalizer_tpu.model import heisenberg_ops
from renormalizer_tpu.mps import StackedMpo
from renormalizer_tpu.mps.gs import construct_mps_mpo, optimize_mps
from renormalizer_tpu.utils import CompressConfig, CompressCriteria, OptimizeConfig

procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]


@pytest.mark.fast
def test_mpo_dense_heisenberg():
    nspin = 4
    model = Model([BasisHalfSpin(i) for i in range(nspin)], heisenberg_ops(nspin))
    mpo = Mpo(model)
    assert np.allclose(mpo.todense(), dense_hamiltonian(model))
    assert mpo.is_hermitian()


@pytest.mark.parametrize("algo", ["qr", "Hopcroft-Karp", "Hungarian"])
def test_mpo_dense_holstein(algo):
    model = exact_model()
    mpo = Mpo(model, algo=algo)
    assert np.allclose(mpo.todense(), dense_hamiltonian(model), atol=1e-10)


def test_mpo_bond_dims_compact():
    # compiler produces the compact (nontrivial) MPO: Holstein fixture
    mpo = Mpo(holstein_model)
    # interior bond dims should stay modest (reference yields ~6-10 here)
    assert max(mpo.bond_dims) < 12


def test_mps_random_canonical():
    mps = Mps.random(holstein_model, 1, 10)
    assert mps.check_left_canonical()
    assert np.allclose(mps.mp_norm, 1)
    # quantum number structure: nexciton=1
    assert mps.qntot == np.array([1])


def test_from_dense_round_trip():
    model = exact_model()
    rng = np.random.default_rng(42)
    wfn = rng.random(int(np.prod(model.pbond_list)))
    wfn /= np.linalg.norm(wfn)
    mps = Mps.from_dense(model, wfn)
    assert np.allclose(mps.todense(), wfn)


def test_canonicalise_preserves_state():
    model = exact_model()
    mpo = Mpo(model)
    mps = Mps.random(model, 1, 10)
    dense0 = mps.todense()
    mps.canonicalise()
    assert np.allclose(mps.todense(), dense0)
    mps.canonicalise()
    assert np.allclose(mps.todense(), dense0)


def test_mpo_apply_vs_dense():
    model = exact_model()
    mpo = Mpo(model)
    mps = Mps.random(model, 1, 10)
    h = dense_hamiltonian(model)
    applied = mpo.apply(mps)
    assert np.allclose(applied.todense(), h @ mps.todense())


@pytest.mark.fast
def test_compress():
    model = exact_model()
    mpo = Mpo(model)
    mps = Mps.random(model, 1, 10)
    applied = mpo.apply(mps)
    dense = applied.todense()
    applied.canonicalise()
    applied.compress(temp_m_trunc=1000)  # no real truncation
    assert np.allclose(applied.todense(), dense)


def test_add_dot_distance():
    model = exact_model()
    a = Mps.random(model, 1, 8)
    b = Mps.random(model, 1, 8)
    s = a.add(b)
    assert np.allclose(s.todense(), a.todense() + b.todense())
    assert np.isclose(a.conj().dot(b), np.dot(a.todense(), b.todense()))
    assert np.isclose(
        a.distance(b), np.linalg.norm(a.todense() - b.todense()), atol=1e-8
    )


@pytest.mark.fast
def test_expectation():
    model = exact_model()
    mps = Mps.random(model, 1, 8)
    mpo = Mpo(model)
    h = dense_hamiltonian(model)
    v = mps.todense()
    assert np.isclose(mps.expectation(mpo), v @ h @ v)
    # expectations with shared environments
    occ_mpos = [Mpo(model, Op(r"a^\dagger a", dof)) for dof in model.e_dofs]
    vals = mps.expectations(occ_mpos)
    for dof, val in zip(model.e_dofs, vals):
        op_dense = dense_hamiltonian(
            Model(model.basis, [Op(r"a^\dagger a", dof)])
        )
        assert np.isclose(val, v @ op_dense @ v)


@pytest.mark.fast
def test_dmrg_tiny_vs_dense():
    """DMRG on the tiny exact model vs dense diagonalization in the
    1-exciton sector."""
    model = exact_model()
    h = dense_hamiltonian(model)
    # project on the 1-exciton sector
    qn_per_state = np.zeros(h.shape[0], dtype=int)
    dims = model.pbond_list
    for state in range(h.shape[0]):
        idx = np.unravel_index(state, dims)
        qn_per_state[state] = sum(
            model.basis[i].sigmaqn[idx[i]][0] for i in range(len(dims))
        )
    sector = np.nonzero(qn_per_state == 1)[0]
    e_exact = np.linalg.eigvalsh(h[np.ix_(sector, sector)])[0]

    mps, mpo = construct_mps_mpo(model, 16, 1)
    mps.optimize_config.procedure = [[8, 0.4], [16, 0.2], [16, 0], [16, 0]]
    energies, mps_opt = optimize_mps(mps.copy(), mpo)
    assert np.isclose(min(energies), e_exact, atol=1e-8)


@pytest.mark.parametrize("method", ["1site", "2site"])
def test_dmrg_holstein_regression(method):
    """The reference's flagship GS regression
    (``renormalizer/mps/tests/test_gs.py:21-37``): E = 0.08401412 + zpe."""
    mps, mpo = construct_mps_mpo(holstein_model, procedure[0][0], 1)
    mps.optimize_config.procedure = procedure
    mps.optimize_config.method = method
    energies, mps_opt = optimize_mps(mps.copy(), mpo)
    assert energies[-1] == pytest.approx(GS_E, rel=1e-5)
    assert mps_opt.expectation(mpo) == pytest.approx(GS_E, rel=1e-5)


def test_dmrg_direct_algo():
    mps, mpo = construct_mps_mpo(holstein_model, 10, 1)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0], [30, 0]]
    mps.optimize_config.algo = "direct"
    energies, _ = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-4)


def test_dmrg_stacked_mpo():
    """StackedMpo: split the Hamiltonian terms into two MPOs; summed
    eigenproblem should give the same ground state."""
    model = holstein_model
    terms1 = model.ham_terms[: len(model.ham_terms) // 2]
    terms2 = model.ham_terms[len(model.ham_terms) // 2:]
    stacked = StackedMpo([Mpo(model, terms1), Mpo(model, terms2)])
    mps, _ = construct_mps_mpo(model, 10, 1)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [30, 0], [30, 0]]
    energies, _ = optimize_mps(mps.copy(), stacked)
    assert min(energies) == pytest.approx(GS_E, rel=1e-4)


def test_dmrg_nroots():
    """State-averaged DMRG for 2 lowest states vs dense sector spectrum."""
    model = exact_model()
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn_per_state = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sector = np.nonzero(qn_per_state == 1)[0]
    e_exact = np.linalg.eigvalsh(h[np.ix_(sector, sector)])[:2]

    mps, mpo = construct_mps_mpo(model, 16, 1)
    mps.optimize_config.procedure = [[8, 0.4], [16, 0.2], [16, 0], [16, 0], [16, 0]]
    mps.optimize_config.nroots = 2
    energies, mps_list = optimize_mps(mps.copy(), mpo)
    assert np.allclose(sorted(energies[-1]), e_exact, atol=1e-6)


def test_dump_load(tmp_path):
    model = exact_model()
    mps = Mps.random(model, 1, 8)
    fname = str(tmp_path / "mps.npz")
    mps.dump(fname)
    mps2 = Mps.load(model, fname)
    assert np.allclose(mps.todense(), mps2.todense())
    assert mps2.qnidx == mps.qnidx
    assert np.all(mps2.qntot == mps.qntot)


def test_optimize_omega():
    """(H - omega)^2 mode targets the interior eigenstate closest to omega."""
    model = exact_model()
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    s1 = np.nonzero(qn == 1)[0]
    w = np.linalg.eigvalsh(h[np.ix_(s1, s1)])
    mps = Mps.random(model, 1, 24)
    mps.optimize_config = OptimizeConfig(
        procedure=[[24, 0.4], [24, 0.2], [24, 0.1], [24, 0], [24, 0], [24, 0]]
    )
    _, opt = optimize_mps(mps, Mpo(model), omega=w[1] + 0.02)
    e_fin = opt.expectation(Mpo(model))
    assert abs(e_fin - w[1]) < 1e-8


def test_variational_compress():
    """Sweeping-fit compression of mpo @ mps vs the exact dense product."""
    model = exact_model()
    mpo = Mpo(model)
    small = Mps.random(model, 1, 12)
    small.compress_config = CompressConfig(CompressCriteria.fixed, max_bonddim=24)
    dense_big = (mpo @ small).todense()
    comp = small.variational_compress(mpo)
    err = np.linalg.norm(comp.todense() - dense_big) / np.linalg.norm(dense_big)
    assert err < 1e-10


def test_mpo_dump_load(tmp_path):
    model = exact_model()
    mpo = Mpo(model)
    p = str(tmp_path / "mpo.npz")
    mpo.dump(p)
    mpo2 = Mpo.load(model, p)
    assert np.allclose(mpo.todense(), mpo2.todense())


def test_ofs():
    """On-the-fly swapping ground state: scheme-1 Holstein, OFS-S
    (protocol mirrors reference ``mps/tests/test_gs.py:89-100``)."""
    from renormalizer_tpu import Model
    from renormalizer_tpu.utils import OFS

    model1 = holstein_model.switch_scheme(1)
    mps, mpo = construct_mps_mpo(model1, 10, 1)
    mps.model = Model(mps.model.basis, mps.model.ham_terms)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    mps.optimize_config.method = "2site"
    mps.compress_config.ofs = OFS.ofs_s
    energies, mps_opt = optimize_mps(mps.copy(), mpo)
    assert abs(energies[-1] - GS_E) / GS_E < 1e-5
    assert abs(mps_opt.expectation(Mpo(mps_opt.model)) - GS_E) / GS_E < 1e-5


def test_thermalprop_checkpoint(tmp_path):
    """TdMpsJob dump + thermal-state reload round trip."""
    import os
    from renormalizer_tpu.mps import MpDm, ThermalProp
    from renormalizer_tpu.mps.thermalprop import load_thermal_state
    from renormalizer_tpu.utils import EvolveConfig, EvolveMethod

    model = exact_model()
    mpdm = MpDm.max_entangled_ex(model)
    tp = ThermalProp(mpdm, evolve_config=EvolveConfig(EvolveMethod.tdvp_ps),
                     dump_dir=str(tmp_path), job_name="ckpt")
    tp.evolve(None, 4, 2.0 / 2j)
    # job dict dumped atomically
    dump = np.load(tmp_path / "ckpt.npz", allow_pickle=True)
    assert "energies" in dump or "time series" in dump
    # state checkpoint round trip
    path = str(tmp_path / "state.npz")
    tp.latest_mps.dump(path)
    loaded = load_thermal_state(model, path)
    assert loaded is not None
    assert np.allclose(loaded.todense(), tp.latest_mps.todense(), atol=1e-10)
    # missing file -> None (no crash)
    assert load_thermal_state(model, str(tmp_path / "nothing.npz")) is None


def test_dmrg_fci_solver():
    """PySCF-style FCI solver: energy reconstructed exactly from its own
    1- and 2-RDMs, rdm1 trace = nelec."""
    from renormalizer_tpu.mps.gs import DmrgFCISolver

    rng = np.random.default_rng(3)
    n = 2
    h1 = rng.standard_normal((n, n))
    h1 = (h1 + h1.T) / 2
    c = rng.standard_normal((3, n, n))
    c = (c + c.transpose(0, 2, 1)) / 2
    h2 = np.einsum("mij,mkl->ijkl", c, c) * 0.3
    solver = DmrgFCISolver()
    e, _ = solver.kernel(h1, h2, n, (1, 1))
    rdm1 = np.asarray(solver.make_rdm1(None, n, (1, 1)))
    rdm2 = np.asarray(solver.make_rdm2(None, n, (1, 1)))
    assert abs(np.trace(rdm1) - 2) < 1e-8
    e_rdm = np.einsum("ij,ij->", h1, rdm1) + 0.5 * np.einsum("ijkl,ijkl->", h2, rdm2)
    assert abs(e_rdm - e) < 1e-8


def test_intersite_and_exact_propagator():
    """Mpo.intersite matches the dense operator; exact_propagator matches
    expm of the pure-phonon Hamiltonian in GS space."""
    import scipy.linalg
    from renormalizer_tpu.utils import Quantity

    model = exact_model()
    # intersite: J a_0^dagger a_2
    mpo = Mpo.intersite(model, {0: r"a^\dagger", 2: "a"}, {}, Quantity(0.3))
    dense = dense_hamiltonian(Model(model.basis, [Op(r"a^\dagger a", [0, 2], 0.3)]))
    assert np.allclose(mpo.todense(), dense, atol=1e-10)

    # exact propagator in GS space: e^{x * H_ph}
    x = -0.37
    prop = Mpo.exact_propagator(model, x, space="GS")
    hph = dense_hamiltonian(
        Model(model.basis, [Op(r"b^\dagger b", d, 1.0) for d in model.v_dofs])
    )
    # restrict comparison to the 0-exciton sector where the propagator acts
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(hph.shape[0])
    ])
    s0 = np.nonzero(qn == 0)[0]
    dense_prop = np.asarray(prop.todense())[np.ix_(s0, s0)]
    oracle = scipy.linalg.expm(x * hph[np.ix_(s0, s0)])
    assert np.allclose(dense_prop, oracle, atol=1e-8)


def test_optimize_arpack():
    """Host ARPACK eigensolver cross-validates the fused device Davidson."""
    model = exact_model()
    mps = Mps.random(model, 1, 16)
    mps.optimize_config = OptimizeConfig(procedure=[[16, 0.4], [16, 0.2], [16, 0], [16, 0]])
    mps.optimize_config.algo = "arpack"
    energies, _ = optimize_mps(mps, Mpo(model))
    assert abs(min(np.min(np.asarray(e)) for e in energies) - 0.3361574408) < 1e-7


def test_dmrg_lobpcg():
    """On-device LOBPCG eigensolver option reproduces the GS regression."""
    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    mps.optimize_config.algo = "lobpcg"
    energies, _ = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)


def test_dmrg_primme_string():
    """The reference's documented algo='primme' string is honored
    (PRIMME-class role filled by the on-device LOBPCG;
    ``renormalizer/mps/gs.py:486-576``)."""
    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    mps.optimize_config.algo = "primme"
    energies, _ = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)
