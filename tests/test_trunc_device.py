"""On-device randomized sector-pure truncation (``mps/trunc_device.py``).

Parity oracle: the host qn-blocked LAPACK SVD (``mps/svd_qn.py``), which is
itself verified against the reference semantics by the DMRG/evolution suite.
"""

import numpy as np
import pytest

from renormalizer_tpu.mps import trunc_device
from renormalizer_tpu.mps.lib import select_indices
from renormalizer_tpu.mps.svd_qn import svd_qn


def _blocked_matrix(rng, m, n, qntot):
    qnl = rng.integers(0, 2, (m, 1))
    qnr = rng.integers(0, 2, (n, 1))
    c = rng.standard_normal((m, n))
    c *= (qnl + qnr.T) == qntot
    return c, qnl, qnr


@pytest.mark.parametrize("system", ["L", "R"])
@pytest.mark.fast
def test_candidates_match_host_svd(system):
    rng = np.random.default_rng(0)
    m, n, cap = 90, 110, 40
    c, qnl, qnr = _blocked_matrix(rng, m, n, np.array([1]))
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, np.array([1]), system, cap, want_complement=False
    )
    _, su, qnl_ref, _, _, _ = svd_qn(
        c, qnl, qnr, np.array([1]), system=system, full_matrices=False
    )
    s_ref = np.sort(su)[::-1]
    s_dev = np.sort(sigma)[::-1]
    k = min(cap, len(s_ref))
    np.testing.assert_allclose(s_dev[:k], s_ref[:k], atol=1e-8)

    sidx = select_indices(sigma, qn_list, cap, 0)
    ms, comp = trunc_device.apply_selection(c, parts, sidx, m, n, system)
    ms, comp = np.asarray(ms), np.asarray(comp)
    # exact orthonormality
    assert np.abs(ms.conj().T @ ms - np.eye(ms.shape[1])).max() < 1e-10
    # sector purity of every kept column
    qrow = qnl if system == "L" else qnr
    for j in range(ms.shape[1]):
        sup = np.abs(ms[:, j]) > 1e-12
        assert len(set(map(tuple, qrow[sup]))) == 1
    # optimal truncation residual
    recon = ms @ comp if system == "L" else comp @ ms.T
    resid = np.linalg.norm(c - recon)
    resid_opt = np.sqrt(max(np.sum(s_ref**2) - np.sum(s_ref[:k] ** 2), 0))
    assert resid < resid_opt * 1.0001 + 1e-9


def test_complement_candidates_orthonormal():
    """percent-based allocation needs valid zero-weight in-sector states."""
    rng = np.random.default_rng(1)
    m, n, cap = 90, 30, 25
    c, qnl, qnr = _blocked_matrix(rng, m, n, np.array([1]))
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, np.array([1]), "L", cap, want_complement=True
    )
    sidx = select_indices(sigma, qn_list, cap, 0.5)
    ms, _ = trunc_device.apply_selection(c, parts, sidx, m, n, "L")
    ms = np.asarray(ms)
    assert np.abs(ms.conj().T @ ms - np.eye(ms.shape[1])).max() < 1e-9


def test_zero_sector_block_is_safe():
    """An all-zero sector must not poison the factorization with NaNs."""
    rng = np.random.default_rng(2)
    m, n = 60, 60
    qnl = rng.integers(0, 2, (m, 1))
    qnr = rng.integers(0, 2, (n, 1))
    c = rng.standard_normal((m, n))
    c *= (qnl + qnr.T) == 1
    c[(qnl == 0).ravel()] = 0.0  # kill one sector entirely
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, np.array([1]), "L", 20, want_complement=True
    )
    assert np.all(np.isfinite(sigma))
    sidx = select_indices(sigma, qn_list, 20, 0)
    ms, comp = trunc_device.apply_selection(c, parts, sidx, m, n, "L")
    recon = np.asarray(ms) @ np.asarray(comp)
    assert np.isfinite(recon).all()


def test_dmrg_device_trunc_regression(monkeypatch):
    """Full DMRG through the device-truncation path hits the GS regression."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    from fixtures import holstein_model, GS_E
    from renormalizer_tpu.mps import Mps, Mpo
    from renormalizer_tpu.mps.gs import optimize_mps

    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    mps.optimize_config.method = "2site"
    energies, opt_mps = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)
    assert opt_mps.check_left_canonical() or opt_mps.check_right_canonical()
    assert opt_mps.expectation(mpo) == pytest.approx(GS_E, rel=1e-5)


def test_dmrg_async_trunc_regression(monkeypatch):
    """Zero-sync steady-state sweeps (selection from the previous sweep's
    asynchronously fetched spectrum) converge to the same ground state."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    monkeypatch.setenv("RENO_ASYNC_TRUNC", "1")
    from fixtures import holstein_model, GS_E
    from renormalizer_tpu.mps import Mps, Mpo
    from renormalizer_tpu.mps.gs import optimize_mps

    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1]] + [[40, 0]] * 3
    energies, _ = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)


def test_ttns_device_path(monkeypatch):
    """Tree engine through the device factorizations: expand + optimize."""
    monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
    from fixtures import exact_model, dense_hamiltonian
    from renormalizer_tpu.tn import BasisTree, TTNO, TTNS, optimize_ttns

    model = exact_model()
    basis_tree = BasisTree.binary(model.basis)
    ttno = TTNO(basis_tree, model.ham_terms)
    ttns = TTNS(basis_tree, condition={0: 1})
    ttns = ttns.expand_bond_dimension(ttno)  # exercises compress_factors + QR
    ttns.check_canonical()

    h = dense_hamiltonian(model)
    dims = model.pbond_list
    qn = np.array([
        sum(model.basis[i].sigmaqn[np.unravel_index(s, dims)[i]][0]
            for i in range(len(dims)))
        for s in range(h.shape[0])
    ])
    sector = np.nonzero(qn == 1)[0]
    e_exact = np.linalg.eigvalsh(h[np.ix_(sector, sector)])[0]
    ttns2 = TTNS.random(basis_tree, 1, 16)
    e_list = optimize_ttns(ttns2, ttno, [[16, 0.4], [16, 0.2], [16, 0], [16, 0]])
    assert min(e_list) == pytest.approx(e_exact, abs=1e-7)


def test_pallas_jacobi_eigh_matches_lapack():
    """The Pallas parallel-Jacobi eigensolver (interpret mode on CPU)."""
    from renormalizer_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(3)
    for n in (24, 96):
        a = rng.standard_normal((n, n))
        a = (a + a.T) / 2
        w, v = jacobi_eigh(a)
        w, v = np.asarray(w), np.asarray(v)
        np.testing.assert_allclose(w, np.linalg.eigvalsh(a), atol=1e-11)
        assert np.abs(v.T @ v - np.eye(n)).max() < 1e-12
        assert np.abs(a @ v - v * w[None, :]).max() < 1e-11


def test_candidates_with_pallas_eigh(monkeypatch):
    """Device truncation with the Pallas Jacobi Rayleigh-Ritz step."""
    monkeypatch.setenv("RENO_PALLAS_EIGH", "1")
    trunc_device._sector_factory.cache_clear()
    rng = np.random.default_rng(4)
    m, n, cap = 70, 90, 30
    c, qnl, qnr = _blocked_matrix(rng, m, n, np.array([1]))
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, np.array([1]), "L", cap, want_complement=False
    )
    _, su, _, _, _, _ = svd_qn(c, qnl, qnr, np.array([1]), system="L",
                               full_matrices=False)
    k = min(cap, len(su))
    np.testing.assert_allclose(
        np.sort(sigma)[::-1][:k], np.sort(su)[::-1][:k], atol=1e-8
    )
    trunc_device._sector_factory.cache_clear()


def test_candidates_multi_component_qn():
    """Two-component quantum numbers (the QC (N_alpha, N_beta) case)."""
    rng = np.random.default_rng(5)
    m, n, cap = 80, 100, 30
    qnl = rng.integers(0, 2, (m, 2))
    qnr = rng.integers(0, 2, (n, 2))
    qntot = np.array([1, 1])
    c = rng.standard_normal((m, n))
    c *= np.all(qnl[:, None, :] + qnr[None, :, :] == qntot, axis=-1)
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, qntot, "L", cap, want_complement=False
    )
    _, su, qnl_ref, _, _, _ = svd_qn(c, qnl, qnr, qntot, system="L",
                                     full_matrices=False)
    k = min(cap, len(su))
    np.testing.assert_allclose(
        np.sort(sigma)[::-1][:k], np.sort(su)[::-1][:k], atol=1e-8
    )
    sidx = select_indices(sigma, qn_list, cap, 0)
    ms, comp = trunc_device.apply_selection(c, parts, sidx, m, n, "L")
    ms = np.asarray(ms)
    assert np.abs(ms.T @ ms - np.eye(ms.shape[1])).max() < 1e-10
    # every kept column is pure in BOTH qn components
    for j in range(ms.shape[1]):
        sup = np.abs(ms[:, j]) > 1e-12
        assert len(set(map(tuple, qnl[sup]))) == 1
    # full device SVD factors too
    res = trunc_device.compress_factors(c, qnl, qnr, qntot, "L")
    u, s, _, v, _, _ = res
    rec = (np.asarray(u) * s) @ np.asarray(v).T
    assert np.abs(rec - c).max() < 1e-10


def test_async_trunc_qn_drift_stress(monkeypatch):
    """VERDICT r2 item 6: async-plan contract under qn-pattern drift at
    M=128.  Growth sweeps (percent>0) jump straight into percent=0 sweeps on
    a multi-sector model, so the per-bond qn pattern keeps shifting while
    the zero-sync plan reuse is active; every shift must be detected by the
    pattern hash (falling back to one synchronous fetch) and the final
    energy must match the fully synchronous selection path."""
    from fixtures import holstein_model, GS_E
    from renormalizer_tpu.mps import Mps, Mpo
    from renormalizer_tpu.mps.gs import optimize_mps

    mpo = Mpo(holstein_model)
    seed_mps = Mps.random(holstein_model, 1, 32, percent=1.0)
    # growth into percent=0 at M=128: the qn split drifts between the first
    # percent=0 sweeps (bond dims still reshuffling across sectors)
    procedure = [[32, 0.5], [64, 0.3], [128, 0]] + [[128, 0]] * 3

    def run(async_flag):
        monkeypatch.setenv("RENO_DEVICE_TRUNC", "1")
        monkeypatch.setenv("RENO_ASYNC_TRUNC", async_flag)
        mps = seed_mps.copy()
        mps.optimize_config.procedure = procedure
        mps.optimize_config.method = "2site"
        energies, opt = optimize_mps(mps, mpo)
        return np.asarray(energies), opt

    e_sync, opt_sync = run("0")
    e_async, opt_async = run("1")
    # identical selection decisions => identical sweep-by-sweep energies
    assert min(e_async) == pytest.approx(GS_E, rel=1e-5)
    assert min(e_async) == pytest.approx(min(e_sync), rel=1e-9, abs=1e-10)
    # the async path must land on the same bond dimensions
    assert [m.shape for m in opt_async] == [m.shape for m in opt_sync]


def test_pallas_jacobi_eigh_convergence_monitor():
    """The kernel keeps sweeping past the base count until the off-diagonal
    norm hits the dtype floor, and reports the relative residual."""
    from renormalizer_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(5)
    # pathological: tight eigenvalue clusters over 12 decades
    lam_true = np.repeat(10.0 ** np.arange(-6, 6), 8)
    q, _ = np.linalg.qr(rng.standard_normal((96, 96)))
    a = (q * lam_true) @ q.T
    a = (a + a.T) / 2
    # force a low base sweep count: the while-loop must extend it
    w, v, resid = jacobi_eigh(a, sweeps=2, return_resid=True)
    assert float(resid) < 1e-7
    np.testing.assert_allclose(np.asarray(w), np.sort(lam_true), rtol=1e-8,
                               atol=1e-10)
    vv = np.asarray(v)
    assert np.abs(vv.T @ vv - np.eye(96)).max() < 1e-10


@pytest.mark.parametrize("system", ["L", "R"])
def test_candidates_cholqr_orth_matches_host_svd(system, monkeypatch):
    """The matmul-only shifted-CholeskyQR3 orthogonalization kernel
    (RENO_TRUNC_ORTH=cholqr) reproduces the host LAPACK truncation,
    including an ill-conditioned spectrum (12 decades)."""
    monkeypatch.setenv("RENO_TRUNC_ORTH", "cholqr")
    trunc_device._sector_factory.cache_clear()
    rng = np.random.default_rng(2)
    m, n, cap = 90, 110, 40
    c, qnl, qnr = _blocked_matrix(rng, m, n, np.array([1]))
    # grade the spectrum harshly (12 decades) by row scaling — preserves the
    # qn-block structure while making every sector ill-conditioned
    c = c * (10.0 ** -np.linspace(0, 12, m))[:, None]
    parts, sigma, qn_list = trunc_device.candidates(
        c, qnl, qnr, np.array([1]), system, cap, want_complement=False
    )
    _, su, _, _, _, _ = svd_qn(
        c, qnl, qnr, np.array([1]), system=system, full_matrices=False
    )
    s_ref = np.sort(su)[::-1]
    s_dev = np.sort(sigma)[::-1]
    k = min(cap, len(s_ref))
    np.testing.assert_allclose(s_dev[:k], s_ref[:k], rtol=1e-6,
                               atol=1e-10 * s_ref[0])
    sidx = select_indices(sigma, qn_list, cap, 0)
    ms, comp = trunc_device.apply_selection(c, parts, sidx, m, n, system)
    ms = np.asarray(ms)
    assert np.abs(ms.conj().T @ ms - np.eye(ms.shape[1])).max() < 1e-9
    recon = ms @ np.asarray(comp) if system == "L" else np.asarray(comp) @ ms.T
    resid = np.linalg.norm(c - recon)
    resid_opt = np.sqrt(max(np.sum(s_ref**2) - np.sum(s_ref[:k] ** 2), 0))
    assert resid < resid_opt * 1.001 + 1e-12 * s_ref[0]
    trunc_device._sector_factory.cache_clear()


def test_threshold_sketch_dmrg(monkeypatch):
    """VERDICT r2 missing item 3: threshold-criteria truncation stays on
    device beyond the exact-rank cap via a sketched factorization whose
    spectrum is normalized against the exact Frobenius norm; saturated
    sectors that never reach the threshold cut trigger the host fallback."""
    from fixtures import holstein_model
    from renormalizer_tpu.mps import Mps, Mpo
    from renormalizer_tpu.mps.gs import optimize_mps
    from renormalizer_tpu.utils import CompressConfig, CompressCriteria

    mpo = Mpo(holstein_model)
    seed = Mps.random(holstein_model, 1, 16, percent=1.0)

    def cc(thr):
        return CompressConfig(CompressCriteria.threshold, threshold=thr)

    procedure = [[cc(1e-3), 0.4], [cc(1e-4), 0.2], [cc(1e-5), 0],
                 [cc(1e-5), 0]]

    calls = {"frob": 0}
    orig_frob = trunc_device.frob_norm

    def spy_frob(arr):
        calls["frob"] += 1
        return orig_frob(arr)

    def run(dev_flag, sketch_cap):
        monkeypatch.setenv("RENO_DEVICE_TRUNC", dev_flag)
        monkeypatch.setenv("RENO_ASYNC_TRUNC", "0")
        # rank > 4 already counts as "large": every interior bond sketches
        monkeypatch.setenv("RENO_TRUNC_EXACT_CAP", "4")
        monkeypatch.setenv("RENO_TRUNC_SKETCH_CAP", sketch_cap)
        mps = seed.copy()
        mps.optimize_config.procedure = procedure
        energies, opt = optimize_mps(mps, mpo)
        return np.asarray(energies), opt

    monkeypatch.setattr("renormalizer_tpu.mps.mp.trunc_device.frob_norm",
                        spy_frob)
    e_host, _ = run("0", "48")
    assert calls["frob"] == 0
    e_dev, _ = run("1", "48")
    assert calls["frob"] > 0  # the sketch path actually ran
    assert min(e_dev) == pytest.approx(min(e_host), rel=1e-6)

    # guard: a sketch too narrow to reach the threshold cut must fall back
    # to the host factorization (detected via saturated-sector spectra),
    # not silently drop kept states
    calls["frob"] = 0
    e_tiny, _ = run("1", "1")
    assert min(e_tiny) == pytest.approx(min(e_host), rel=1e-6)


@pytest.mark.parametrize("system", ["L", "R"])
def test_batched_candidates_match_sector_loop(system, monkeypatch):
    """The one-dispatch batched kernel (RENO_TRUNC_BATCH) must produce the
    same candidate spectrum and an equally good basis as the per-sector
    dispatch loop (not bit-identical: the padded sketch widths differ, so
    the random test matrices differ — both are exact up to the sketch)."""
    rng = np.random.default_rng(7)
    m, n, cap = 150, 130, 48
    qnl = rng.integers(0, 3, (m, 1))
    qnr = rng.integers(0, 3, (n, 1))
    qntot = np.array([2])
    c = rng.standard_normal((m, n))
    c *= (qnl + qnr.T) == qntot

    def run():
        parts, sigma, qn_list = trunc_device.candidates(
            c, qnl, qnr, qntot, system, cap, want_complement=False
        )
        sidx = select_indices(sigma, qn_list, cap, 0)
        ms, comp = trunc_device.apply_selection(c, parts, sidx, m, n, system)
        return np.sort(sigma[sigma >= 0])[::-1], np.asarray(ms), np.asarray(comp)

    monkeypatch.setenv("RENO_TRUNC_BATCH", "1")
    s_b, ms_b, comp_b = run()
    monkeypatch.setenv("RENO_TRUNC_BATCH", "0")
    s_l, ms_l, comp_l = run()

    k = min(cap, min(len(s_b), len(s_l)))
    np.testing.assert_allclose(s_b[:k], s_l[:k], atol=1e-8)
    # both bases orthonormal and equally good truncations
    for ms, comp in ((ms_b, comp_b), (ms_l, comp_l)):
        assert np.abs(ms.conj().T @ ms - np.eye(ms.shape[1])).max() < 1e-10
    recon_b = ms_b @ comp_b if system == "L" else comp_b @ ms_b.T
    recon_l = ms_l @ comp_l if system == "L" else comp_l @ ms_l.T
    np.testing.assert_allclose(
        np.linalg.norm(c - recon_b), np.linalg.norm(c - recon_l), atol=1e-9
    )


@pytest.mark.parametrize("system", ["L", "R"])
def test_masked_kernel_basis_quality_f32(system, monkeypatch):
    """Round-3 regression: at f32, the mask-only batched kernel's QR used
    to complete numerically-dependent columns with junk directions OUTSIDE
    the sector rows; masking then produced sub-unit, mutually non-orthogonal
    basis columns (ortho_err ~1e-3) that collapsed DMRG over a few sweeps.
    With the in-sector completion regularizer the selected basis must be
    orthonormal to f32 roundoff and exactly qn-pure — for the masked AND the
    gather-bucketed batched kernels."""
    rng = np.random.default_rng(3)
    m, n, cap = 200, 180, 64
    qnl = rng.integers(0, 3, (m, 1))
    qnr = rng.integers(0, 3, (n, 1))
    qntot = np.array([2])
    # DMRG-like blocks with exponentially decaying sector spectra: the decay
    # to 1e-9 guarantees columns beyond the f32 numerical rank exist
    c = np.zeros((m, n), dtype=np.float32)
    for q in range(3):
        ls = np.where(qnl[:, 0] == q)[0]
        rs = np.where((qntot[0] - qnr[:, 0]) == q)[0]
        r = min(len(ls), len(rs))
        if r == 0:
            continue
        u, _ = np.linalg.qr(rng.standard_normal((len(ls), r)))
        v, _ = np.linalg.qr(rng.standard_normal((len(rs), r)))
        s = 10.0 ** np.linspace(0, -9, r)
        c[np.ix_(ls, rs)] = (u * s) @ v.T

    monkeypatch.setenv("RENO_TRUNC_BATCH", "1")
    for budget in ("999999999", "0"):  # masked kernel, then gather fallback
        monkeypatch.setenv("RENO_TRUNC_MASK_BUDGET", budget)
        parts, sigma, qn_list = trunc_device.candidates(
            c, qnl, qnr, qntot, system, cap, want_complement=False
        )
        sidx = select_indices(sigma, qn_list, cap, 0)
        ms, _ = trunc_device.apply_selection(c, parts, sidx, m, n, system)
        ms = np.asarray(ms)
        gram = ms.conj().T @ ms
        assert np.abs(gram - np.eye(ms.shape[1])).max() < 5e-6
        # a system-L column labeled nl lives on rows with qnl == nl; a
        # system-R column is labeled qntot - nl and lives on rows with
        # qnr == qntot - nl, i.e. rows whose qnr equals the label itself
        qn_rows = qnl[:, 0] if system == "L" else qnr[:, 0]
        for k, i in enumerate(sidx):
            off = ms[qn_rows != qn_list[i][0], k]
            assert np.abs(off).max() == 0.0
