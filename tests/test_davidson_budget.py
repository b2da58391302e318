"""HBM-budgeted Davidson workspace + host-RAM spill.

The reference spills Davidson trial vectors to an h5py file above a size
threshold (``renormalizer/lib/davidson/davidson.py:515-560``).  The TPU
rendition shrinks the fixed on-device workspace to fit a byte budget
(``RENO_DAVIDSON_WS_BYTES``) and, past the point where even the minimal
workspace fits, runs the host-orchestrated Davidson whose basis lives in
host RAM with only the matvec on device."""

import numpy as np
import pytest

import jax.numpy as jnp

from renormalizer_tpu.lib import solvers

FORMULA = "abc,bdef,fghj,ljk,cehk->adgl"
M, W, D = 6, 4, 2
N = M * D * D * M


def _operands():
    rng = np.random.default_rng(7)
    L = rng.standard_normal((M, W, M))
    L = (L + L.transpose(2, 1, 0)) / 2
    Wc = rng.standard_normal((W, D, D, W))
    Wc = (Wc + Wc.transpose(0, 2, 1, 3)) / 2
    R = rng.standard_normal((M, W, M))
    R = (R + R.transpose(2, 1, 0)) / 2
    return [jnp.asarray(t) for t in (L, Wc, Wc, R)]


def _dense(operands):
    h = np.zeros((N, N))
    for i in range(N):
        e = np.zeros(N)
        e[i] = 1.0
        h[:, i] = np.asarray(
            jnp.einsum(FORMULA, *operands, jnp.asarray(e).reshape(M, D, D, M))
        ).ravel()
    return (h + h.T) / 2


@pytest.fixture
def problem():
    operands = _operands()
    h = _dense(operands)
    e_exact = np.linalg.eigvalsh(h)[0]
    hdiag = jnp.asarray(np.diag(h))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal(N))
    mask = jnp.ones(N, dtype=bool)
    return operands, e_exact, hdiag, x0, mask


@pytest.mark.fast
def test_budget_shrinks_workspace(problem, monkeypatch):
    """A budget that fits only a small workspace still converges (thick
    restart), to the same eigenvalue."""
    operands, e_exact, hdiag, x0, mask = problem
    itemsize = np.dtype(float).itemsize
    # room for exactly 2*5 rows -> max_space capped at 5
    monkeypatch.setenv("RENO_DAVIDSON_WS_BYTES", str(2 * 5 * N * itemsize))
    assert solvers._budgeted_max_space(12, N, itemsize) == 5
    e, c, _ = solvers.davidson_fused(
        FORMULA, operands, (M, D, D, M), x0, hdiag, mask,
        tol=1e-10, max_cycle=400)
    assert abs(float(e) - e_exact) < 1e-8
    assert c.shape == (M, D, D, M)  # reshape folded into the dispatch
    hx = jnp.einsum(FORMULA, *operands, c).ravel()
    assert np.linalg.norm(np.asarray(hx - e * c.ravel())) < 1e-6


@pytest.mark.fast
def test_spill_to_host(problem, monkeypatch):
    """A budget below the minimal device workspace routes through the
    host-RAM-spilled Davidson and matches the dense eigenvalue."""
    operands, e_exact, hdiag, x0, mask = problem
    monkeypatch.setenv("RENO_DAVIDSON_WS_BYTES", str(N))  # < 2*4 rows
    assert solvers._budgeted_max_space(12, N, np.dtype(float).itemsize) == 0
    e, c, niter = solvers.davidson_fused(
        FORMULA, operands, (M, D, D, M), x0, hdiag, mask,
        tol=1e-10, max_cycle=300)
    assert int(niter) == -1  # spill-path marker
    assert abs(float(e) - e_exact) < 1e-8


def test_spill_with_fused_hdiag(problem, monkeypatch):
    """The spill path reproduces the factory's on-device hdiag assembly
    (diag_mode) when no explicit diagonal is passed."""
    operands, e_exact, hdiag, x0, mask = problem
    monkeypatch.setenv("RENO_DAVIDSON_WS_BYTES", str(N))
    e, c, _ = solvers.davidson_fused(
        FORMULA, operands, (M, D, D, M), x0, None, mask,
        tol=1e-10, max_cycle=300, diag_mode="2")
    assert abs(float(e) - e_exact) < 1e-8


def test_unbudgeted_path_unchanged(problem, monkeypatch):
    monkeypatch.delenv("RENO_DAVIDSON_WS_BYTES", raising=False)
    operands, e_exact, hdiag, x0, mask = problem
    e, _, niter = solvers.davidson_fused(
        FORMULA, operands, (M, D, D, M), x0, hdiag, mask,
        tol=1e-10, max_cycle=200)
    assert int(niter) >= 0
    assert abs(float(e) - e_exact) < 1e-8
