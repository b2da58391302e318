"""Ab-initio quantum-chemistry DMRG: Jordan-Wigner qc_model vs dense FCI on
synthetic integrals (protocol mirrors reference ``mps/tests/test_gs.py:103-149``
with generated data instead of a stored FCIDUMP)."""

import numpy as np
import pytest

from fixtures import dense_hamiltonian

from renormalizer_tpu import Model, Mpo, Mps
from renormalizer_tpu.model.h_qc import int_to_h, qc_model, read_fcidump
from renormalizer_tpu.mps import StackedMpo
from renormalizer_tpu.mps.gs import optimize_mps
from renormalizer_tpu.utils import OptimizeConfig


def _integrals(n=3, seed=5):
    """Random hermitian spatial integrals with the 8-fold eri symmetry."""
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n, n))
    h = (h + h.T) / 2
    c = rng.standard_normal((4, n, n))
    c = (c + c.transpose(0, 2, 1)) / 2
    eri = np.einsum("mij,mkl->ijkl", c, c) * 0.2  # chemists' (ij|kl)
    return h, eri


def _fci(model, nelec):
    hd = dense_hamiltonian(model)
    dims = model.pbond_list
    qn_all = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]]
            for i in range(len(dims)))
        for s in range(hd.shape[0])
    ])
    sector = np.nonzero((qn_all == np.array(nelec)).all(axis=-1))[0]
    return np.linalg.eigvalsh(hd[np.ix_(sector, sector)])[0]


@pytest.mark.parametrize("stacked", (False, True))
def test_qc_dmrg(stacked):
    h, eri = _integrals()
    h1e, h2e = int_to_h(h, eri)
    basis, ham_terms = qc_model(h1e, h2e, stacked=stacked)
    if stacked:
        model = Model(basis, [t for terms in ham_terms for t in terms])
        mpo = StackedMpo([Mpo(Model(basis, terms)) for terms in ham_terms])
    else:
        model = Model(basis, ham_terms)
        mpo = Mpo(model)
    nelec = [1, 1]
    e_fci = _fci(model, nelec)

    mps = Mps.random(model, nelec, 16, percent=1.0)
    mps.optimize_config = OptimizeConfig(
        procedure=[[16, 0.4], [16, 0.2], [16, 0.1], [16, 0], [16, 0], [16, 0]]
    )
    mps.optimize_config.method = "2site"
    energies, _ = optimize_mps(mps, mpo)
    e = min(np.min(np.asarray(x)) for x in energies)
    assert abs(e - e_fci) < 1e-8


@pytest.mark.fast
def test_read_fcidump(tmp_path):
    """FCIDUMP round trip: write -> read -> same spin-orbital integrals."""
    h, eri = _integrals(n=2, seed=7)
    n = h.shape[0]
    path = tmp_path / "test.fcidump"
    with open(path, "w") as f:
        f.write(f"&FCI NORB={n},NELEC=2,MS2=0,\n")
        f.write(" ORBSYM=" + "1," * n + "\n")
        f.write(" ISYM=1,\n")
        f.write("&END\n")
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    for l in range(n):
                        f.write(f"{eri[i, j, k, l]:.16e} {i+1} {j+1} {k+1} {l+1}\n")
        for i in range(n):
            for j in range(n):
                f.write(f"{h[i, j]:.16e} {i+1} {j+1} 0 0\n")
        f.write("42.25 0 0 0 0\n")
    sh, aseri, nuc = read_fcidump(str(path), n)
    sh_ref, aseri_ref = int_to_h(h, eri)
    assert np.allclose(sh, sh_ref)
    assert np.allclose(aseri, aseri_ref)
    assert nuc == 42.25


H2O_FCIDUMP = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "data", "h2o_fcidump.txt"
)


def test_qc_dmrg_h2o():
    """H2O/STO-3G QC-DMRG vs the published FCI energy -75.008697516450
    (regression oracle of reference ``example/h2o_qc.py:47-60``); the FCIDUMP
    integral data file is vendored in tests/data (standard-format quantum
    chemistry data, originally from the reference's example set)."""
    from renormalizer_tpu.utils import OptimizeConfig

    h1e, h2e, nuc = read_fcidump(H2O_FCIDUMP, 7)
    basis, ham_terms = qc_model(h1e, h2e)
    model = Model(basis, ham_terms)
    M = 50
    mps = Mps.random(model, [5, 5], M, percent=1.0)
    mps.optimize_config = OptimizeConfig(
        procedure=[[M, 0.4], [M, 0.2], [M, 0.1]] + [[M, 0]] * 6
    )
    mps.optimize_config.method = "2site"
    energies, _ = optimize_mps(mps, Mpo(model))
    e = min(float(np.min(np.asarray(x))) for x in energies) + nuc
    assert abs(e - -75.008697516450) < 1e-8
