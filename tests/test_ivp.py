"""Adaptive RKF45 ``solve_ivp`` vs SciPy's RK45 controller
(reference vendors SciPy: ``lib/integrate/_ivp/rk.py``)."""

import numpy as np
import pytest
import scipy.integrate
import scipy.linalg

from renormalizer_tpu.lib.solvers import solve_ivp


@pytest.mark.parametrize("rtol,atol", [(1e-5, 1e-8), (1e-7, 1e-10)])
def test_step_counts_match_scipy(rtol, atol):
    rng = np.random.default_rng(0)
    n = 24
    a = rng.standard_normal((n, n))
    a = a - a.T  # skew-symmetric: oscillatory, exercises the controller
    y0 = rng.standard_normal(n)

    def f(t, y):
        return a @ np.asarray(y)

    mine = solve_ivp(f, (0.0, 3.0), y0, rtol=rtol, atol=atol)
    ref = scipy.integrate.solve_ivp(
        f, (0.0, 3.0), y0, rtol=rtol, atol=atol, method="RK45"
    )
    exact = scipy.linalg.expm(a * 3.0) @ y0
    err = np.linalg.norm(np.asarray(mine.y) - exact) / np.linalg.norm(exact)
    assert err < rtol * 50
    assert mine.nsteps < (ref.t.size - 1) * 2  # VERDICT: within 2x of reference


def test_max_step_respected():
    def f(t, y):
        return -y

    res = solve_ivp(f, (0.0, 1.0), np.ones(4), rtol=1e-6, atol=1e-9, max_step=0.05)
    assert res.nsteps >= 20
    np.testing.assert_allclose(np.asarray(res.y), np.exp(-1.0), rtol=1e-5)


@pytest.mark.fast
def test_complex_state():
    h = np.array([[1.0, 0.3], [0.3, -0.5]])

    def f(t, y):
        return -1j * (h @ np.asarray(y))

    y0 = np.array([1.0 + 0j, 0j])
    res = solve_ivp(f, (0.0, 2.0), y0, rtol=1e-8, atol=1e-11)
    exact = scipy.linalg.expm(-1j * h * 2.0) @ y0
    np.testing.assert_allclose(np.asarray(res.y), exact, atol=1e-6)


def test_davidson_host_complex():
    """davidson_host accepts complex Hermitian problems (TDA on complex
    states; round-1 hardcoded float)."""
    from renormalizer_tpu.lib.solvers import davidson_host

    rng = np.random.default_rng(0)
    n = 60
    a = 0.1 * (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    a = (a + a.conj().T) / 2 + np.diag(np.arange(n) * 2.0)
    w_ref = np.linalg.eigvalsh(a)

    def hop(v):
        return a @ v

    def precond(r, e):
        return r / (np.diag(a).real - e + 1e-4)

    e, c = davidson_host(hop, [rng.standard_normal(n) + 0j], precond, tol=1e-10)
    assert abs(e - w_ref[0]) < 1e-8
    assert np.iscomplexobj(c)
    e3, _ = davidson_host(
        hop, [rng.standard_normal(n) + 0j for _ in range(3)], precond,
        nroots=3, tol=1e-10,
    )
    np.testing.assert_allclose(e3, w_ref[:3], atol=1e-7)
