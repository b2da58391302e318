"""Multi-chip sharding tests on the virtual CPU device mesh
(conftest forces 8 host devices)."""

import numpy as np
import pytest

from fixtures import dense_hamiltonian

import renormalizer_tpu.parallel as par
from renormalizer_tpu import BasisHalfSpin, Model, Mpo, Mps, Op
from renormalizer_tpu.model import heisenberg_ops
from renormalizer_tpu.mps.gs import optimize_mps
from renormalizer_tpu.utils import OptimizeConfig


@pytest.fixture
def mesh22():
    mesh = par.make_mesh(data=1, i=2, j=2)
    par.set_global_mesh(mesh)
    yield mesh
    par.set_global_mesh(None)


@pytest.mark.fast
def test_sharded_hop_matches_dense(mesh22):
    """Sharded 2-site effective-H matvec == single-device einsum."""
    import jax.numpy as jnp

    formula = "abc,bdef,fghj,ljk,cehk->adgl"
    M, w, d = 16, 5, 3
    rng = np.random.default_rng(0)
    L = rng.standard_normal((M, w, M))
    W1 = rng.standard_normal((w, d, d, w))
    W2 = rng.standard_normal((w, d, d, w))
    R = rng.standard_normal((M, w, M))
    x = rng.standard_normal((M, d, d, M))
    shapes = tuple(t.shape for t in (L, W1, W2, R))
    hop = par.sharded_hop_factory(mesh22, formula, shapes, x.shape)
    assert hop is not None
    out = np.asarray(hop(L, W1, W2, R, x.ravel())).reshape(M, d, d, M)
    ref = np.asarray(jnp.einsum(formula, L, W1, W2, R, x))
    assert np.allclose(out, ref, atol=1e-10)


def test_sharded_hop_fallback():
    """Indivisible bond dims return None (caller falls back)."""
    mesh = par.make_mesh(data=1, i=2, j=2)
    formula = "abc,bdef,fghj,ljk,cehk->adgl"
    shapes = ((15, 5, 15), (5, 3, 3, 5), (5, 3, 3, 5), (15, 5, 15))
    assert par.sharded_hop_factory(mesh, formula, shapes, (15, 3, 3, 15)) is None


def test_dmrg_with_global_mesh(mesh22):
    """DMRG sweeps with the global mesh installed reproduce the
    single-device ground-state energy (interior sites sharded, edge sites
    fall back automatically)."""
    import renormalizer_tpu.parallel.hop as hop_mod

    calls = {"sharded": 0}
    orig = hop_mod.sharded_hop_factory

    def counting(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            calls["sharded"] += 1
        return r

    hop_mod.sharded_hop_factory = counting
    try:
        # spin chain: single qn sector, power-of-two bond dims divide the mesh
        nspin = 10
        model = Model([BasisHalfSpin(i) for i in range(nspin)], heisenberg_ops(nspin))
        mps = Mps.random(model, 0, 32)
        mps.optimize_config = OptimizeConfig(
            procedure=[[32, 0.4], [32, 0.2], [32, 0], [32, 0]]
        )
        energies, _ = optimize_mps(mps, Mpo(model))
        e = min(np.min(np.asarray(en)) for en in energies)
    finally:
        hop_mod.sharded_hop_factory = orig
    e_exact = np.linalg.eigvalsh(dense_hamiltonian(model))[0]
    assert abs(e - e_exact) < 1e-7
    assert calls["sharded"] > 0, "no site update was actually sharded"


def test_tdvp_with_global_mesh(mesh22):
    """TDVP-PS with the global mesh reproduces single-device dynamics."""
    from renormalizer_tpu.utils import EvolveConfig, EvolveMethod

    nspin = 10
    model = Model([BasisHalfSpin(i) for i in range(nspin)], heisenberg_ops(nspin))
    mpo = Mpo(model)

    def run():
        mps = Mps.hartree_product_state(
            model, {i: (1 if i % 2 == 0 else 0) for i in range(nspin)}
        )
        mps = mps.expand_bond_dimension(hint_mpo=mpo)
        mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
        for _ in range(3):
            mps = mps.evolve(mpo, 0.2)
        return np.array(mps.expectations([Op("Z", i) for i in range(nspin)]))

    with_mesh = run()
    par.set_global_mesh(None)
    without = run()
    assert np.allclose(with_mesh, without, atol=1e-8)


def test_ttns_with_global_mesh(mesh22):
    """TTNS DMRG with the global mesh installed runs the generalized
    bond-tensor-parallel tree hop (child/parent environment bra axes over
    i/j) and matches single-device; non-shardable nodes fall back."""
    from renormalizer_tpu.parallel import hop as phop
    from renormalizer_tpu.tn import BasisTree, TTNO, TTNS, optimize_ttns

    nspin = 8
    basis = [BasisHalfSpin(i) for i in range(nspin)]
    tree = BasisTree.binary(basis)
    ham = heisenberg_ops(nspin)
    ttno = TTNO(tree, ham)

    def run():
        ttns = TTNS.random(tree, 0, 16)
        e = optimize_ttns(ttns, ttno)
        return min(np.min(np.asarray(x)) for x in e)

    phop.reset_stats()
    e_mesh = run()
    assert phop.STATS["sharded"] > 0, "tree hop never engaged the mesh"
    par.set_global_mesh(None)
    e_single = run()
    model = Model(basis, ham)
    e_exact = np.linalg.eigvalsh(dense_hamiltonian(model))[0]
    assert abs(e_mesh - e_single) < 1e-7
    assert abs(e_mesh - e_exact) < 1e-7


@pytest.mark.fast
def test_general_tree_hop_matches_dense(mesh22):
    """The generalized sharded hop (arbitrary effective-H einsum) equals the
    single-device einsum on a 3-child tree-node contraction."""
    import jax.numpy as jnp

    # child env E1(bra a, mpo e, ket b), parent env Ep(bra c, mpo f, ket d),
    # TTNO core O(e, phys-out g, phys-in h, f), x(b, h, d) -> y(a, g, c);
    # phys dim 3 is indivisible so the i/j axes land on the two env bras
    formula = "aeb,cfd,eghf,bhd->agc"
    rng = np.random.default_rng(3)
    E1 = rng.standard_normal((8, 3, 8))
    Ep = rng.standard_normal((6, 3, 6))
    O = rng.standard_normal((3, 3, 3, 3))
    x = rng.standard_normal((8, 3, 6))
    shapes = (E1.shape, Ep.shape, O.shape)
    hop = par.sharded_general_hop_factory(mesh22, formula, shapes, x.shape)
    assert hop is not None
    out = np.asarray(hop(E1, Ep, O, x.ravel()))
    ref = np.einsum(formula, E1, Ep, O, x).ravel()
    np.testing.assert_allclose(out, ref, rtol=1e-10, atol=1e-10)


@pytest.mark.fast
def test_collective_inventory(mesh22):
    """HLO collective audit: the sharded 2-site hop shows one all-gather per
    sharded mesh axis with the payload bytes of the gathered output."""
    from renormalizer_tpu.parallel import hop as phop

    formula = "abc,bdef,fghj,ljk,cehk->adgl"
    M, w, d = 16, 5, 3
    shapes = ((M, w, M), (w, d, d, w), (w, d, d, w), (M, w, M))
    cshape = (M, d, d, M)
    hop = par.sharded_hop_factory(mesh22, formula, shapes, cshape)
    import jax.numpy as jnp

    dummies = [jnp.zeros(s) for s in shapes]
    x = jnp.zeros(int(np.prod(cshape)))
    inv = phop.collective_inventory(hop, *dummies, x)
    assert "all-gather" in inv
    assert inv["all-gather"]["count"] == 2
    assert inv["all-gather"]["bytes"] > 0


@pytest.mark.fast
def test_engaged_registry_and_audit(mesh22):
    """record_engagement fills the engaged-executable registry and
    audit_engaged_collectives compiles + inventories each entry."""
    from renormalizer_tpu.parallel import hop as phop

    phop.reset_stats()
    formula = "abc,bdef,fghj,ljk,cehk->adgl"
    shapes = ((16, 5, 16), (5, 3, 3, 5), (5, 3, 3, 5), (16, 5, 16))
    cshape = (16, 3, 3, 16)
    assert phop.record_engagement(mesh22, formula, shapes, cshape)
    assert phop.record_engagement(mesh22, formula, shapes, cshape)
    audit = phop.audit_engaged_collectives(mesh22, n_sweeps=2)
    assert len(audit["executables"]) == 1
    assert audit["executables"][0]["calls"] == 2
    per_sweep = audit["per_sweep_lower_bound"]
    assert per_sweep["all-gather"]["count"] == 2.0  # 2 gathers x 2 calls / 2


def test_sector_parallel_candidates_bit_identical(mesh22, monkeypatch):
    """Per-sector truncation kernels placed round-robin over the mesh
    (SURVEY §2.6 axis (a)) return bit-identical candidates/spectra to the
    single-device dispatch chain."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    # this test compares sector PLACEMENT, not kernel families: the batched
    # one-dispatch kernels only run when sector placement is off, so pin
    # them off for both sides of the comparison
    monkeypatch.setenv("RENO_TRUNC_BATCH", "0")
    from renormalizer_tpu.mps import trunc_device

    rng = np.random.default_rng(11)
    # multi-sector qn structure: 3 sectors on each side
    qnl = np.repeat(np.array([[0], [1], [2]]), [20, 30, 14], axis=0)
    qnr = np.repeat(np.array([[2], [1], [0]]), [16, 28, 20], axis=0)
    c = rng.standard_normal((len(qnl), len(qnr)))
    # zero out cross-sector blocks so c is qn-conserving (qntot = 2)
    mask = (qnl[:, None, 0] + qnr[None, :, 0]) == 2
    c = c * mask

    def run(flag):
        monkeypatch.setenv("RENO_SECTOR_PARALLEL", flag)
        trunc_device._IDX_CACHE.clear()
        parts, sigma, qn_list = trunc_device.candidates(
            c, qnl, qnr, np.array([2]), "L", 32, want_complement=False
        )
        return [np.asarray(p) for p in parts], sigma, qn_list

    parts0, sigma0, qn0 = run("0")
    parts1, sigma1, qn1 = run("1")
    assert qn0 == qn1
    assert np.array_equal(sigma0, sigma1)
    for a, b in zip(parts0, parts1):
        assert np.array_equal(a, b)


def test_sector_parallel_dmrg_regression(mesh22, monkeypatch):
    """Full DMRG with device truncation sector-parallel over the mesh."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    monkeypatch.setenv("RENO_SECTOR_PARALLEL", "1")
    from fixtures import holstein_model, GS_E

    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0]]
    energies, _ = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)
