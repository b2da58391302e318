"""Tree tensor network tests: cross-checks against MPS/MPO and dense oracles
(mirrors ``renormalizer/tn/tests/test_tn.py`` strategy)."""

import numpy as np
import pytest

from fixtures import dense_hamiltonian, exact_model

from renormalizer_tpu import BasisHalfSpin, Model, Mpo, Mps, Op, Quantity
from renormalizer_tpu.model import heisenberg_ops
from renormalizer_tpu.tn import BasisTree, TTNO, TTNS, TTNEnviron, from_mps, optimize_ttns
from renormalizer_tpu.utils import EvolveConfig, EvolveMethod


def heisenberg_model(nspin=4):
    return Model([BasisHalfSpin(i) for i in range(nspin)], heisenberg_ops(nspin))


@pytest.mark.parametrize("tree_kind", ["linear", "binary"])
def test_ttno_dense_vs_mpo(tree_kind):
    model = heisenberg_model(4)
    mpo = Mpo(model)
    basis_tree = getattr(BasisTree, tree_kind)(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    dense_ttno = ttno.todense(order=model.basis)
    assert np.allclose(dense_ttno, mpo.todense(), atol=1e-10)


def test_ttno_mctdh_tree():
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary_mctdh(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    assert np.allclose(
        ttno.todense(order=model.basis), dense_hamiltonian(model), atol=1e-10
    )


@pytest.mark.fast
def test_ttns_hartree_and_expectation():
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS(basis_tree, condition={0: 1, 2: 1})
    # dense check of one- and two-site expectations
    for op in [Op("Z", 0), Op("Z", 1), Op("Z Z", [0, 2])]:
        ttno = TTNO(basis_tree, [op])
        val = ttns.expectation(ttno)
        dense_op = dense_hamiltonian(Model(model.basis, [op]))
        dense_state = np.zeros(2 ** 4)
        # |1 0 1 0> in site-major ordering
        idx = np.ravel_multi_index((1, 0, 1, 0), (2, 2, 2, 2))
        dense_state[idx] = 1
        assert np.isclose(val, dense_state @ dense_op @ dense_state)


def test_ttns_random_canonical():
    model = exact_model()
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 1, 8)
    assert ttns.is_canonical()
    assert np.isclose(ttns.ttns_norm, 1)


@pytest.mark.fast
def test_from_mps_round_trip():
    model = exact_model()
    mps = Mps.random(model, 1, 8)
    basis, ttns, ttno = from_mps(mps)
    # expectation parity between the two engines
    e_mps = mps.expectation(Mpo(model))
    e_ttns = ttns.expectation(ttno)
    assert np.isclose(e_mps, e_ttns, atol=1e-8)


def test_ttns_canonicalise_preserves_state():
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 0, 8)
    dense0 = ttns.todense(order=model.basis)
    ttns.push_cano_to_child(ttns.root, 0)
    dense1 = ttns.todense(order=model.basis)
    assert np.allclose(dense0, dense1, atol=1e-10)
    ttns.push_cano_to_parent(ttns.root.children[0])
    assert np.allclose(ttns.todense(order=model.basis), dense0, atol=1e-10)


def test_ttno_apply_and_compress():
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    ttns = TTNS.random(basis_tree, 0, 8)
    dense_state = ttns.todense(order=model.basis).ravel()
    h = dense_hamiltonian(model)
    applied = ttno.apply(ttns)
    assert np.allclose(
        applied.todense(order=model.basis).ravel(), h @ dense_state, atol=1e-8
    )
    applied.canonicalise()
    applied.compress(temp_m_trunc=100)
    assert np.allclose(
        applied.todense(order=model.basis).ravel(), h @ dense_state, atol=1e-8
    )


@pytest.mark.parametrize("tree_kind", ["linear", "binary"])
def test_optimize_ttns(tree_kind):
    """Tree DMRG ground state vs dense sector diagonalization."""
    model = exact_model()
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sector = np.nonzero(qn == 1)[0]
    e_exact = np.linalg.eigvalsh(h[np.ix_(sector, sector)])[0]

    basis_tree = getattr(BasisTree, tree_kind)(model.basis)
    ttns = TTNS.random(basis_tree, 1, 16)
    procedure = [[16, 0.4], [16, 0.2], [16, 0], [16, 0]]
    e_list = optimize_ttns(ttns, TTNO(basis_tree, model.ham_terms), procedure)
    assert np.isclose(min(min(e) for e in [e_list]), e_exact, atol=1e-7) or np.isclose(
        min(e_list), e_exact, atol=1e-7
    )


def _sector_spectrum(model, nexciton, k):
    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sector = np.nonzero(qn == nexciton)[0]
    return np.linalg.eigvalsh(h[np.ix_(sector, sector)])[:k]


@pytest.mark.fast
def test_optimize_ttns_arpack():
    """Host-Lanczos (scipy eigsh) tree eigensolver cross-validates the
    device Davidson (reference offers arpack: ``tn/gs.py:105-109``)."""
    from renormalizer_tpu.utils import OptimizeConfig

    model = exact_model()
    e_exact = _sector_spectrum(model, 1, 1)[0]
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 1, 16)
    ttns.optimize_config = OptimizeConfig(procedure=[[16, 0.4], [16, 0.2], [16, 0], [16, 0]])
    ttns.optimize_config.algo = "arpack"
    e_list = optimize_ttns(ttns, TTNO(basis_tree, model.ham_terms))
    assert np.isclose(min(e_list), e_exact, atol=1e-7)


def test_optimize_ttns_nroots():
    """State-averaged tree DMRG (nroots=2): the reference tree engine is
    single-root (``renormalizer/tn/gs.py:73``); cross-checked against both
    the dense sector spectrum and the MPS engine's nroots result."""
    from renormalizer_tpu.mps.gs import optimize_mps
    from renormalizer_tpu.utils import OptimizeConfig

    model = exact_model()
    e_exact = _sector_spectrum(model, 1, 2)

    # MPS engine on the same model (the cross-check baseline)
    mps = Mps.random(model, 1, 16)
    mps.optimize_config = OptimizeConfig(
        procedure=[[8, 0.4], [16, 0.2], [16, 0], [16, 0], [16, 0]])
    mps.optimize_config.nroots = 2
    mps_energies, _ = optimize_mps(mps, Mpo(model))

    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 1, 16)
    ttns.optimize_config = OptimizeConfig(
        procedure=[[8, 0.4], [16, 0.2], [16, 0], [16, 0], [16, 0]])
    ttns.optimize_config.nroots = 2
    e_list = optimize_ttns(ttns, TTNO(basis_tree, model.ham_terms))

    ttns_final = sorted(np.atleast_1d(e_list[-1]))
    assert np.allclose(ttns_final, e_exact, atol=1e-6)
    assert np.allclose(ttns_final, sorted(mps_energies[-1]), atol=1e-6)


@pytest.mark.parametrize("method", [
    EvolveMethod.tdvp_ps, EvolveMethod.tdvp_ps2, EvolveMethod.tdvp_vmf,
])
def test_ttns_evolve(method):
    """Tree TDVP variants vs dense expm on the tiny Holstein model."""
    import scipy.linalg

    model = exact_model()
    basis_tree = BasisTree.binary(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    # initial state: electron on dof 0
    ttns = TTNS(basis_tree, condition={0: 1})
    ttns = ttns.expand_bond_dimension(ttno)
    ttns.evolve_config = EvolveConfig(method)
    if method is EvolveMethod.tdvp_ps2:
        # 2-site splitting: tighten truncation so the splitting error
        # (not the truncation error) dominates, as in the MPS test
        from renormalizer_tpu.utils import CompressConfig
        ttns.compress_config = CompressConfig(threshold=1e-7)
    psi0 = ttns.todense(order=model.basis).ravel().astype(complex)
    h = dense_hamiltonian(model)

    occ_ops = [
        dense_hamiltonian(Model(model.basis, [Op(r"a^\dagger a", dof)]))
        for dof in model.e_dofs
    ]
    occ_ttnos = [TTNO(basis_tree, [Op(r"a^\dagger a", dof)]) for dof in model.e_dofs]

    dt, nsteps = 0.2, 5
    devs = []
    for i in range(1, nsteps + 1):
        ttns = ttns.evolve(ttno, dt)
        psit = scipy.linalg.expm(-1j * h * dt * i) @ psi0
        occ_oracle = [np.real(psit.conj() @ o @ psit) for o in occ_ops]
        occ = [ttns.expectation(o) for o in occ_ttnos]
        devs.append(np.abs(np.array(occ) - occ_oracle).mean())
    assert np.mean(devs) < 1e-4


def test_ttns_add():
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary(model.basis)
    a = TTNS.random(basis_tree, 0, 4)
    b = TTNS.random(basis_tree, 0, 4)
    # different random states: regenerate b by evolving... simply scale
    b = b.scale(0.7)
    s = a.add(b)
    assert np.allclose(
        s.todense(order=model.basis), a.todense(order=model.basis) + b.todense(order=model.basis),
        atol=1e-10,
    )


@pytest.mark.parametrize("tree_kind", ["t3ns", "binary_mctdh"])
def test_ttno_more_topologies(tree_kind):
    model = heisenberg_model(4)
    basis_tree = getattr(BasisTree, tree_kind)(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    assert np.allclose(
        ttno.todense(order=model.basis), dense_hamiltonian(model), atol=1e-10
    )


def test_ttns_dump_load(tmp_path):
    model = exact_model()
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 1, 8)
    p = str(tmp_path / "ttns.npz")
    ttns.dump(p)
    ttns2 = TTNS.load(basis_tree, p)
    assert np.allclose(
        ttns.todense(order=model.basis), ttns2.todense(order=model.basis), atol=1e-12
    )
    ttno = TTNO(basis_tree, model.ham_terms)
    p2 = str(tmp_path / "ttno.npz")
    ttno.dump(p2)


def test_partial_ttno():
    """TTNO over a subset of dofs applied to a TTNS on an auxiliary-doubled
    tree equals the identity-extended TTNO (the thermofield machinery)."""
    model = heisenberg_model(4)
    basis_tree = BasisTree.binary(model.basis)
    basis_tree2 = basis_tree.add_auxiliary_space()
    ttns = TTNS.random(basis_tree2, 0, 4)
    ttno = TTNO(basis_tree, model.ham_terms)
    ttno2 = TTNO(basis_tree2, model.ham_terms)
    a = ttno.apply(ttns)
    b = ttno2.apply(ttns)
    assert np.allclose(a.todense(), b.todense(), atol=1e-10)
    assert np.isclose(ttns.expectation(ttno), ttns.expectation(ttno2))


def test_ttns_entropy():
    """Bond entropy equals 1-site entropy at leaf nodes."""
    model = exact_model()
    basis_tree = BasisTree.binary(model.basis)
    ttns = TTNS.random(basis_tree, 1, 8)
    bond_entropy = ttns.calc_bond_entropy()
    site1_entropy = ttns.calc_1site_entropy()
    checked = 0
    for i, node in enumerate(ttns.node_list):
        if not node.children:
            assert np.isclose(bond_entropy[i], site1_entropy[i], atol=1e-8)
            checked += 1
    assert checked > 0


def test_ttns_thermofield():
    """Thermofield max-entangled excited TTNS: normalized, uniform electron
    occupations at infinite temperature, energy conserved under TDVP."""
    from renormalizer_tpu.tn import max_entangled_ex

    model = exact_model()
    tree2 = BasisTree.binary(model.basis).add_auxiliary_space()
    hot = max_entangled_ex(tree2)
    assert np.isclose(hot.ttns_norm, 1)
    occ_ttnos = [TTNO(tree2, [Op(r"a^\dagger a", dof)]) for dof in model.e_dofs]
    occ0 = np.array([hot.expectation(o) for o in occ_ttnos])
    assert np.allclose(occ0, 1 / len(model.e_dofs), atol=1e-10)
    ttno = TTNO(tree2, model.ham_terms)
    hot = hot.expand_bond_dimension(ttno)
    hot.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
    e0 = hot.expectation(ttno)
    for _ in range(3):
        hot = hot.evolve(ttno, 4.0)
    assert abs(hot.expectation(ttno) - e0) < 1e-6
    assert abs(hot.ttns_norm - 1) < 1e-8
