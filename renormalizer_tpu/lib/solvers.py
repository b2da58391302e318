r"""Device-native iterative solvers.

TPU-first replacements for the reference's vendored numerics:

* :func:`davidson` — lowest-eigenpair Davidson, fully fused into one XLA
  ``lax.while_loop`` (replaces PySCF's host Davidson,
  ``renormalizer/lib/davidson/davidson.py:73-460``).  The trial basis lives
  in a fixed-size on-device workspace; subspace diagonalization is masked so
  shapes stay static.  Zero host syncs until the result is read.
* :func:`expm_krylov` — Lanczos approximation of ``expm(dt*A) v`` with full
  reorthogonalization in a fixed-size Krylov space
  (replaces ``renormalizer/lib/krylov/krylov.py:27-100``).
* :func:`solve_ivp` — adaptive RKF45, host-driven control loop around a
  (possibly jitted) right-hand side (replaces the vendored SciPy ``solve_ivp``
  of ``renormalizer/lib/integrate``).  Only the scalar error norm is pulled
  to the host per step.
"""

import os
from functools import lru_cache, partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e30


# ---------------------------------------------------------------------------
# Davidson workspace budgeting
#
# The on-device trial basis is two (max_space, N) panels.  At M=1024 2-site a
# single row is ~150 MB, so the default max_space=12 workspace alone is
# ~3.6 GB of HBM on top of environments, site tensors and the truncation
# scratch.  The budget below shrinks max_space first (the thick restart keeps
# small workspaces convergent, only slower), and above the point where even
# the minimal workspace cannot fit, the basis spills to host RAM — the
# reference's out-of-core h5py trial store
# (``renormalizer/lib/davidson/davidson.py:515-560``) re-done as a
# host-orchestrated Davidson with a device matvec.
# ---------------------------------------------------------------------------

_MIN_DEVICE_SPACE = 4


def _davidson_ws_budget() -> float:
    """Davidson workspace budget in bytes (``RENO_DAVIDSON_WS_BYTES``
    overrides; default 4 GiB on accelerators, unlimited on CPU)."""
    env = os.environ.get("RENO_DAVIDSON_WS_BYTES")
    if env:
        return float(env)
    from renormalizer_tpu.backend import backend

    return 4 * 2 ** 30 if backend.is_accelerator else float("inf")


def _budgeted_max_space(max_space: int, n: int, itemsize: int) -> int:
    """Largest workspace <= ``max_space`` whose two (S, N) panels fit the
    budget; 0 means even the minimal device workspace does not fit (spill)."""
    budget = _davidson_ws_budget()
    if budget == float("inf"):
        return max_space
    cap = int(budget // (2 * n * itemsize))
    if cap < _MIN_DEVICE_SPACE:
        return 0
    return min(max_space, cap)


# ---------------------------------------------------------------------------
# fused factories
#
# The TDVP / DMRG inner loops call the Lanczos/Davidson solvers thousands of
# times with a handful of distinct (einsum formula, shape) combinations.
# Closures would be re-traced on every call; instead the solver body is built
# once per formula via these factories and jax's jit cache handles per-shape
# executables.  One XLA computation per local step — no per-iteration
# dispatch, no host syncs.
# ---------------------------------------------------------------------------


def _einsum_hop(formula: str, operands, cshape):
    def hop_flat(v):
        c = v.reshape(cshape)
        return jnp.einsum(formula, *operands, c, optimize="optimal").ravel()

    return hop_flat


# ---------------------------------------------------------------------------
# Davidson
# ---------------------------------------------------------------------------

class _DavidsonState(NamedTuple):
    V: jnp.ndarray        # (S, N) trial basis, rows orthonormal
    W: jnp.ndarray        # (S, N) H @ V
    size: jnp.ndarray     # current basis size
    theta: jnp.ndarray    # current ritz value
    x: jnp.ndarray        # current ritz vector
    hx: jnp.ndarray       # H @ x
    rnorm: jnp.ndarray    # residual norm
    it: jnp.ndarray


def _davidson_core(hop, x0, hdiag, tol, max_cycle, max_space):
    N = x0.shape[0]
    S = min(max_space, N)
    dtype = x0.dtype
    # a wider-precision hdiag (e.g. f64 diagonal with an f32 trial vector)
    # would promote the preconditioned direction and turn the V.at[].set
    # scatter into an unsafe downcast (FutureWarning -> error in future jax)
    hdiag = jnp.asarray(hdiag).astype(jnp.real(x0).dtype)

    def body(st: _DavidsonState) -> _DavidsonState:
        # subspace matrix with masked padding.  The padding diagonal must be
        # comfortably above the spectrum but NOT astronomically large: TPU's
        # QDWH eigh normalizes by the matrix norm, so a 1e30 pad would wipe
        # out all precision of the physical block.
        G = st.V.conj() @ st.W.T
        G = (G + G.conj().T) / 2
        pad = jnp.sum(jnp.abs(G)) + 1.0
        mask = jnp.arange(S) >= st.size
        G = G + jnp.diag(jnp.where(mask, pad, 0.0)).astype(G.dtype)
        w_eig, c = jnp.linalg.eigh(G)
        c0 = c[:, 0]
        theta = w_eig[0].real
        x = c0 @ st.V
        hx = c0 @ st.W
        r = hx - theta * x
        rnorm = jnp.linalg.norm(r).real

        # preconditioned new direction, orthogonalized twice against V
        t = r / (hdiag - theta + 1e-4)
        for _ in range(2):
            t = t - st.V.T @ (st.V.conj() @ t)
        tnorm = jnp.linalg.norm(t)
        t = jnp.where(tnorm > 1e-14, t / tnorm, t)

        # thick restart when the workspace is full: collapse to the ritz pair
        restart = st.size >= S
        V = jnp.where(restart, jnp.zeros_like(st.V).at[0].set(x), st.V)
        W = jnp.where(restart, jnp.zeros_like(st.W).at[0].set(hx), st.W)
        size = jnp.where(restart, 1, st.size)

        t = t - V.T @ (V.conj() @ t)
        tnorm2 = jnp.linalg.norm(t)
        t = jnp.where(tnorm2 > 1e-14, t / tnorm2, t)
        V = V.at[size % S].set(t)
        W = W.at[size % S].set(hop(t))
        return _DavidsonState(V, W, size + 1, theta, x, hx, rnorm, st.it + 1)

    def cond(st: _DavidsonState):
        return (st.rnorm > tol) & (st.it < max_cycle)

    v0 = x0 / jnp.linalg.norm(x0)
    V = jnp.zeros((S, N), dtype=dtype).at[0].set(v0)
    W = jnp.zeros((S, N), dtype=dtype).at[0].set(hop(v0))
    init = _DavidsonState(
        V, W, jnp.asarray(1), jnp.asarray(jnp.inf, dtype=jnp.real(x0).dtype),
        v0, W[0], jnp.asarray(jnp.inf, dtype=jnp.real(x0).dtype), jnp.asarray(0),
    )
    st = jax.lax.while_loop(cond, body, init)
    return st.theta, st.x, st.it


def davidson(
    hop: Callable,
    x0,
    hdiag,
    tol: float = 1e-10,
    max_cycle: int = 100,
    max_space: int = 12,
):
    """Lowest eigenpair of the (hermitian) operator ``hop``.

    Returns ``(theta, x, niter)`` as device arrays.  ``x0`` and ``hdiag``
    are flat device vectors in the qn-masked subspace."""
    from renormalizer_tpu.ops.contract import safe_asarray

    x0 = safe_asarray(x0)
    ms = _budgeted_max_space(
        max_space, int(x0.size), np.dtype(str(x0.dtype)).itemsize)
    # a generic hop closure cannot spill (no formula to rebuild on host);
    # run with the minimal workspace — thick restart keeps it convergent
    ms = ms or _MIN_DEVICE_SPACE
    return _davidson_core(
        hop, x0, safe_asarray(hdiag), tol, max_cycle, ms
    )


_OUT_OF_SECTOR = 1e10


@lru_cache(maxsize=None)
def _davidson_factory(formula: str, cshape: Tuple[int, ...], inverse: float,
                      tol: float, max_cycle: int, max_space: int,
                      mesh=None, operand_shapes=None, diag_mode: str = None):
    sharded_hop = None
    if mesh is not None:
        from renormalizer_tpu.parallel.hop import sharded_hop_factory

        sharded_hop = sharded_hop_factory(mesh, formula, operand_shapes, cshape)

    def _solve(x0_full, hdiag_full, mask, operands):
        if sharded_hop is not None:
            def hop_raw(v):
                return sharded_hop(*operands, v)
        else:
            hop_raw = _einsum_hop(formula, operands, cshape)

        def hop(x):
            # the full-space layout keeps shapes identical for every site and
            # sweep (one XLA executable per tensor shape instead of one per
            # sector size — the central recompilation-avoidance trick).  No
            # masking is needed inside the iteration: the MPO and the
            # environments are exactly qn-block-sparse, so H @ x of a masked
            # x has exact zeros outside the sector, and the preconditioned
            # residual inherits them (out-of-sector r is exactly 0).
            return hop_raw(x) * inverse

        hdiag = jnp.where(mask, hdiag_full.reshape(-1) * inverse,
                          _OUT_OF_SECTOR)
        x0 = jnp.where(mask, x0_full.reshape(-1), 0)
        theta, x, it = _davidson_core(hop, x0, hdiag, tol, max_cycle, max_space)
        # gauge fix (largest element positive) + reshape folded into the
        # same dispatch: eagerly they cost 3-4 relay dispatches per site
        # update (profiled: 57 + 79 ms per 18-update steady sweep)
        x = x / jnp.sign(x[jnp.abs(x).argmax()])
        return theta, x.reshape(cshape), it

    if diag_mode is None:
        @jax.jit
        def fused(x0_full, hdiag_full, mask, *operands):
            return _solve(x0_full, hdiag_full, mask, operands)
    else:
        # hdiag computed inside the same dispatch (one fewer host round trip
        # per site update)
        from renormalizer_tpu.ops.contract import hop_diag

        nsite = 1 if diag_mode.startswith("1") else 2
        twolayer = diag_mode.endswith("2l")

        @jax.jit
        def fused(x0_full, mask, *operands):
            if twolayer:
                cmo = [operands[1]] if nsite == 1 else [operands[1], operands[3]]
            else:
                cmo = list(operands[1:-1])
            hdiag_full = hop_diag(operands[0], operands[-1], cmo, twolayer).ravel()
            return _solve(x0_full, hdiag_full, mask, operands)

    return fused


def davidson_fused(formula, operands, cshape, x0_full, hdiag_full, mask,
                   inverse=1.0, tol=1e-10, max_cycle=100, max_space=12,
                   diag_mode: str = None):
    """Fully jitted qn-masked Davidson in the FULL local space, cached per
    (formula, shape).

    ``operands`` are the environment/MPO tensors of the effective-H einsum;
    ``mask`` is the flat boolean quantum-number mask.  The returned ritz
    vector lives in the full space (zero outside the sector).

    When a global mesh is installed (``parallel.set_global_mesh``) the
    matvec is bond-tensor-parallel over the mesh's ``i``/``j`` axes for
    sites whose bond dimensions divide the mesh.

    The workspace is HBM-budgeted (``RENO_DAVIDSON_WS_BYTES``): the trial
    space shrinks first, and local problems too large for even the minimal
    on-device workspace run the host-RAM-spilled Davidson instead."""
    from renormalizer_tpu.parallel.mesh import get_global_mesh

    n = int(np.prod(cshape))
    itemsize = np.dtype(str(jnp.asarray(x0_full).dtype)).itemsize
    max_space_eff = _budgeted_max_space(int(max_space), n, itemsize)
    if max_space_eff == 0:
        return _davidson_spilled(
            formula, operands, cshape, x0_full, hdiag_full, mask,
            inverse=inverse, tol=tol, max_cycle=max_cycle, diag_mode=diag_mode,
        )
    max_space = max_space_eff

    mesh = get_global_mesh()
    operand_shapes = (
        tuple(tuple(np.shape(o)) for o in operands) if mesh is not None else None
    )
    if mesh is not None:
        from renormalizer_tpu.parallel import hop as _phop

        _phop.record_engagement(mesh, formula, operand_shapes, tuple(cshape))
    fn = _davidson_factory(formula, tuple(cshape), float(inverse), float(tol),
                           int(max_cycle), int(max_space), mesh, operand_shapes,
                           diag_mode)
    reshard = _mesh_replicator(mesh)
    operands = [reshard(o) for o in operands]
    # ravel/reshape of the guess happens INSIDE the jitted solver (an eager
    # ravel costs a dispatch per site update); mask arrives pre-raveled from
    # the device_mask cache so .ravel() below is a no-op object return
    if diag_mode is not None:
        assert hdiag_full is None
        return fn(
            reshard(jnp.asarray(x0_full)),
            reshard(jnp.asarray(mask).ravel()), *operands
        )
    return fn(
        reshard(jnp.asarray(x0_full)),
        reshard(jnp.asarray(hdiag_full)),
        reshard(jnp.asarray(mask).ravel()), *operands
    )


@lru_cache(maxsize=None)
def _spill_matvec_factory(formula: str, cshape: Tuple[int, ...], inverse: float):
    @jax.jit
    def run(v, *operands):
        out = jnp.einsum(formula, *operands, v.reshape(cshape),
                         optimize="optimal")
        return out.ravel() * inverse

    return run


def _davidson_spilled(formula, operands, cshape, x0_full, hdiag_full, mask,
                      inverse=1.0, tol=1e-10, max_cycle=100, diag_mode=None):
    """Out-of-core Davidson: the trial basis lives in host RAM, only the
    active vector and the matvec run on the device.

    This is the TPU rendition of the reference's h5py-backed trial store
    (``renormalizer/lib/davidson/davidson.py:515-560``): local problems whose
    (max_space, N) workspace exceeds the HBM budget stream one basis row at a
    time through the device.  Each iteration pays two vector transfers, so
    this is strictly a does-not-OOM path — the budgeted on-device solver
    handles everything that fits."""
    if hdiag_full is None:
        from renormalizer_tpu.ops.contract import hop_diag

        nsite = 1 if diag_mode.startswith("1") else 2
        twolayer = diag_mode.endswith("2l")
        if twolayer:
            cmo = [operands[1]] if nsite == 1 else [operands[1], operands[3]]
        else:
            cmo = list(operands[1:-1])
        hdiag_full = hop_diag(operands[0], operands[-1], cmo, twolayer).ravel()
    mask_np = np.asarray(mask).ravel()
    hd = np.where(mask_np, np.asarray(hdiag_full).ravel() * inverse,
                  _OUT_OF_SECTOR)
    matvec = _spill_matvec_factory(formula, tuple(cshape), float(inverse))

    def hop(v_np):
        # the MPO/environments are exactly qn-block-sparse: H @ (masked v)
        # is exactly zero outside the sector, so no re-masking is needed
        return np.asarray(matvec(jnp.asarray(v_np), *operands))

    def precond(r, e):
        return r / (hd - e + 1e-4)

    x0 = np.where(mask_np, np.asarray(x0_full).ravel(), 0)
    # strict residual criterion: the device Davidson converges on rnorm,
    # and the stagnation early-exit can stall 1e-4 from the eigenpair
    e, c = davidson_host(hop, [x0], precond, nroots=1, tol=tol,
                         max_cycle=max_cycle, strict_residual=True)
    c = c / np.sign(c[np.argmax(np.abs(c))])  # same gauge as the fused path
    return jnp.asarray(e), jnp.asarray(c).reshape(cshape), jnp.asarray(-1)


def _mesh_replicator(mesh):
    """Identity without a mesh; with one, re-places arrays as replicated
    over the mesh.  Needed because arrays committed to a single device
    (e.g. sector-parallel truncation outputs copied back to their home
    device) may not feed a ``shard_map`` over the full mesh directly."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    return put


def davidson_multiroot(
    hop: Callable,
    x0_list,
    hdiag,
    nroots: int,
    tol: float = 1e-9,
    max_cycle: int = 100,
    max_space: int = None,
):
    """Block Davidson for the ``nroots`` lowest eigenpairs, fully fused.

    Used by state-averaged DMRG and TDA (reference callers
    ``renormalizer/mps/gs.py:536-538``).  Returns (thetas, X, niter) with
    ``X`` of shape (nroots, N).
    """
    from renormalizer_tpu.ops.contract import safe_asarray

    X0 = jnp.stack([safe_asarray(x) for x in x0_list])
    N = X0.shape[1]
    # match hdiag to the trial vectors' real dtype (see _davidson_core)
    hdiag = jnp.asarray(hdiag).astype(jnp.real(X0).dtype)
    if max_space is None:
        max_space = max(4 * nroots, 12)
    S = min(max_space, N)
    dtype = X0.dtype

    if S < 2 * nroots:
        # subspace too small for block iteration (tiny masked local problems
        # at chain edges): new directions would overwrite the just-restarted
        # Ritz vectors.  Solve densely instead — N is small here by
        # construction.
        from renormalizer_tpu.ops.contract import safe_eye

        eye = safe_eye(N, dtype=dtype)
        ham = jax.vmap(hop)(eye).T
        # out-of-sector entries (flagged by the huge preconditioner diagonal)
        # must not produce spurious zero modes
        ham = ham + jnp.diag(jnp.where(hdiag > 1e9, hdiag, 0).astype(dtype))
        w_eig, v = jnp.linalg.eigh((ham + ham.conj().T) / 2)
        k = min(nroots, N)
        return w_eig[:k].real, v[:, :k].T, jnp.asarray(0)

    def orth_rows(M):
        # Gram-Schmidt orthonormalize rows (differentiably safe enough here)
        q, _ = jnp.linalg.qr(M.T, mode="reduced")
        return q.T

    def body(carry):
        V, W, size, thetas, X, rmax, it = carry
        G = V.conj() @ W.T
        G = (G + G.conj().T) / 2
        pad = jnp.sum(jnp.abs(G)) + 1.0
        mask = jnp.arange(S) >= size
        G = G + jnp.diag(jnp.where(mask, pad, 0.0)).astype(G.dtype)
        w_eig, c = jnp.linalg.eigh(G)
        cs = c[:, :nroots]
        thetas = w_eig[:nroots].real
        X = cs.T @ V
        HX = cs.T @ W
        R = HX - thetas[:, None] * X
        rnorms = jnp.linalg.norm(R, axis=1).real
        rmax = jnp.max(rnorms)

        T = R / (hdiag[None, :] - thetas[:, None] + 1e-4)
        for _ in range(2):
            T = T - (T @ V.conj().T) @ V

        restart = size + nroots > S
        V = jnp.where(restart, jnp.zeros_like(V).at[:nroots].set(orth_rows(X)), V)
        W_restart = jnp.zeros_like(W)
        # recompute W for the restarted orthonormalized basis
        Vr = V[:nroots]
        W_restart = W_restart.at[:nroots].set(
            jax.vmap(hop)(Vr)
        )
        W = jnp.where(restart, W_restart, W)
        size = jnp.where(restart, nroots, size)

        T = T - (T @ V.conj().T) @ V
        T = orth_rows(T)
        idx = size + jnp.arange(nroots)
        V = V.at[idx % S].set(T)
        W = W.at[idx % S].set(jax.vmap(hop)(T))
        return (V, W, size + nroots, thetas, X, rmax, it + 1)

    def cond(carry):
        _, _, _, _, _, rmax, it = carry
        return (rmax > tol) & (it < max_cycle)

    V = jnp.zeros((S, N), dtype=dtype)
    V = V.at[:nroots].set(orth_rows(X0))
    W = jnp.zeros((S, N), dtype=dtype)
    W = W.at[:nroots].set(jax.vmap(hop)(V[:nroots]))
    init = (
        V, W, jnp.asarray(nroots),
        jnp.full((nroots,), jnp.inf, dtype=jnp.real(X0).dtype),
        V[:nroots],
        jnp.asarray(jnp.inf, dtype=jnp.real(X0).dtype), jnp.asarray(0),
    )
    V, W, size, thetas, X, rmax, it = jax.lax.while_loop(cond, body, init)
    return thetas, X, it


def davidson_host(hop, cguess, precond, nroots=1, tol=1e-9, max_cycle=100,
                  max_space=None, strict_residual=False):
    """Host-orchestrated block Davidson for operators whose matvec is not
    jax-traceable (e.g. the TDA tangent-space Hamiltonian whose hop sweeps
    environments in Python).  ``hop`` maps a 1-d numpy vector to a 1-d numpy
    vector; ``precond(r, e)`` preconditions a residual.

    Returns ``(e, c)`` with ``c`` a list of eigenvectors (or a single vector
    when ``nroots == 1``)."""
    if max_space is None:
        max_space = max(6 * nroots, 14)
    # dtype-aware: complex effective Hamiltonians (e.g. TDA on a complex
    # state) keep complex trial vectors
    dtype = np.result_type(float, *[np.asarray(x).dtype for x in cguess])
    x0 = [np.asarray(x, dtype=dtype) for x in cguess]
    N = x0[0].shape[0]
    max_space = min(max_space, N)

    V = np.zeros((0, N), dtype=dtype)

    def add_vectors(vs, V):
        for v in vs:
            v = v - V.T @ (V.conj() @ v) if len(V) else v.copy()
            v = v - V.T @ (V.conj() @ v) if len(V) else v
            norm = np.linalg.norm(v)
            if norm > 1e-10:
                V = np.vstack([V, v / norm])
        return V

    V = add_vectors(x0, V)
    W = np.array([hop(v) for v in V])
    e_prev = None
    for it in range(max_cycle):
        G = V.conj() @ W.T
        G = (G + G.conj().T) / 2
        w_eig, c = np.linalg.eigh(G)
        k = min(nroots, len(w_eig))
        thetas = w_eig[:k]
        X = c[:, :k].T @ V
        HX = c[:, :k].T @ W
        R = HX - thetas[:, None] * X
        rnorms = np.linalg.norm(R, axis=1)
        converged = np.all(rnorms < tol) or (
            not strict_residual
            and e_prev is not None and len(e_prev) == k
            and np.allclose(thetas, e_prev, atol=tol)
        )
        if converged:
            break
        e_prev = thetas
        if len(V) + k > max_space:
            # thick restart with the current ritz vectors
            V = np.zeros((0, N), dtype=V.dtype)
            V = add_vectors(list(X), V)
            W = np.array([hop(v) for v in V])
        new_dirs = [precond(R[i], thetas[i]) for i in range(k)]
        old_len = len(V)
        V = add_vectors(new_dirs, V)
        if len(V) == old_len:
            break
        W = np.vstack([W, [hop(v) for v in V[old_len:]]])
    e = thetas if nroots > 1 else float(thetas[0])
    c = [X[i] for i in range(min(nroots, X.shape[0]))]
    if nroots == 1:
        c = c[0]
    return e, c


# ---------------------------------------------------------------------------
# Lanczos expm
# ---------------------------------------------------------------------------

def _lanczos_expm(hop, dt, v0, m_max):
    N = v0.shape[0]
    beta0 = jnp.linalg.norm(v0)
    dt = jnp.asarray(dt)
    out_dtype = jnp.result_type(v0.dtype, dt.dtype)

    def lanczos_step(carry, j):
        V, alpha, beta, vprev_beta = carry
        v = V[j]
        w = hop(v)
        a = jnp.real(jnp.vdot(v, w))
        w = w - a * v - vprev_beta[1] * vprev_beta[0]
        # full reorthogonalization (mask handled by zero rows of V)
        w = w - V.T @ (V.conj() @ w)
        b = jnp.linalg.norm(w).real
        vnext = jnp.where(b > 1e-14, w / b, jnp.zeros_like(w))
        V = V.at[j + 1].set(vnext)
        alpha = alpha.at[j].set(a)
        beta = beta.at[j].set(b)
        return (V, alpha, beta, (v, b)), None

    V = jnp.zeros((m_max + 1, N), dtype=v0.dtype).at[0].set(v0 / beta0)
    alpha = jnp.zeros(m_max, dtype=jnp.real(v0).dtype)
    beta = jnp.zeros(m_max, dtype=jnp.real(v0).dtype)
    (V, alpha, beta, _), _ = jax.lax.scan(
        lanczos_step, (V, alpha, beta, (jnp.zeros_like(v0), jnp.asarray(0.0, jnp.real(v0).dtype))),
        jnp.arange(m_max),
    )

    # tridiagonal T; padding rows contribute zero couplings so using the full
    # m_max x m_max matrix is exact once beta hits zero
    T = (
        jnp.diag(alpha)
        + jnp.diag(beta[: m_max - 1], 1)
        + jnp.diag(beta[: m_max - 1], -1)
    )
    w_eig, u = jnp.linalg.eigh(T)
    e1 = u[0, :].conj()
    coef = (u * jnp.exp(dt * w_eig)[None, :]) @ e1
    w = (beta0 * coef.astype(out_dtype)) @ V[:m_max].astype(out_dtype)
    return w, jnp.asarray(m_max)


def expm_krylov(hop: Callable, dt, v0, max_m: int = 30, tol: float = 1e-12):
    """Approximate ``expm(dt * A) @ v0`` for hermitian ``A`` via Lanczos with
    full reorthogonalization (reference ``lib/krylov/krylov.py:27-100``).

    ``dt`` may be complex (real-time evolution uses ``-1j*tau``).
    Returns ``(w, m_used)`` as device arrays."""
    from renormalizer_tpu.ops.contract import safe_asarray

    v0 = safe_asarray(v0)
    m_max = int(min(max_m, v0.shape[0]))
    if not isinstance(dt, jax.Array):
        dt = complex(dt)
        dt = dt.real if dt.imag == 0 else dt
    return _lanczos_expm(hop, safe_asarray(dt), v0, m_max)


@lru_cache(maxsize=None)
def _expm_factory(formula: str, cshape: Tuple[int, ...], max_m: int,
                  mesh=None, operand_shapes=None):
    sharded_hop = None
    if mesh is not None:
        from renormalizer_tpu.parallel.hop import sharded_hop_factory

        sharded_hop = sharded_hop_factory(mesh, formula, operand_shapes, cshape)

    @jax.jit
    def fused(dt, c0, *operands):
        if sharded_hop is not None:
            def hop(v):
                return sharded_hop(*operands, v)
        else:
            hop = _einsum_hop(formula, operands, cshape)
        w, _ = _lanczos_expm(hop, dt, c0.ravel(), max_m)
        return w.reshape(cshape)

    return fused


def expm_krylov_fused(formula, operands, dt, c0, max_m: int = 30):
    """Fully jitted Lanczos expm of an einsum-defined effective Hamiltonian,
    cached per (formula, shape).  The entire local propagation is one XLA
    computation: zero host round-trips and no per-call retracing.

    Mixed real/complex operands are unified to one dtype *outside* the jitted
    kernel: a real-dtype MPO tensor inside a complex Lanczos einsum is legal
    XLA but crashed the tunneled-TPU compiler (round-2 bench SIGABRT,
    ``ElementIsComplex`` on the f32 W operand), so the convert must not
    appear inside the fused graph.  With ``RENO_SPLIT_COMPLEX=1`` complex
    propagations instead run the all-real split kernels
    (:mod:`renormalizer_tpu.lib.split_complex`) so no complex dtype reaches
    the compiler at all.

    With a global mesh installed (``parallel.set_global_mesh``) the matvec
    is bond-tensor-parallel when the bond dimensions divide the mesh."""
    from renormalizer_tpu.parallel.mesh import get_global_mesh
    from renormalizer_tpu.ops.contract import safe_asarray

    c0 = safe_asarray(c0)
    operands = [safe_asarray(o) for o in operands]
    is_cplx = jnp.issubdtype(c0.dtype, jnp.complexfloating) or any(
        jnp.issubdtype(o.dtype, jnp.complexfloating) for o in operands
    )
    if is_cplx:
        from renormalizer_tpu.lib.split_complex import (
            expm_krylov_split, split_complex_enabled)
        from renormalizer_tpu.ops.contract import eager_dtype_unify

        if split_complex_enabled():
            return expm_krylov_split(formula, operands, dt, c0, max_m)
        common = jnp.result_type(c0.dtype, *[o.dtype for o in operands])
        # the Lanczos basis must be complex even when c0 starts real
        # (first real-time step from a real state); the MPO operands stay
        # real and promote inside the fused graph unless the legacy eager
        # mitigation is requested (see ops.contract.eager_dtype_unify)
        if c0.dtype != common:
            c0 = c0.astype(common)
        if eager_dtype_unify():
            operands = [o.astype(common) for o in operands]
    m = int(min(max_m, c0.size))
    mesh = get_global_mesh()
    operand_shapes = (
        tuple(tuple(np.shape(o)) for o in operands) if mesh is not None else None
    )
    if mesh is not None:
        from renormalizer_tpu.parallel import hop as _phop

        _phop.record_engagement(mesh, formula, operand_shapes, tuple(c0.shape))
    fn = _expm_factory(formula, tuple(c0.shape), m, mesh, operand_shapes)
    reshard = _mesh_replicator(mesh)
    # dt may be a python complex scalar (-i*dt for real-time propagation):
    # safe_asarray uploads it as two real scalars + on-device combine.  A
    # zero-imag scalar is kept real so imaginary-time propagation of real
    # states stays in real arithmetic.
    if not isinstance(dt, jax.Array):
        dt = complex(dt)
        dt = dt.real if dt.imag == 0 else dt
    return fn(safe_asarray(dt), reshard(c0),
              *[reshard(o) for o in operands])


# ---------------------------------------------------------------------------
# fused TDVP-PS site update (trivial-qn fast path)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _tdvp_ps_site_factory(formula1: str, env_formula: str, formula0: str,
                          cshape: Tuple[int, ...], m: int, n: int,
                          to_right: bool, has_backward: bool,
                          m_max1: int, m_max0: int,
                          row_ids: Tuple[int, ...] = None,
                          col_ids: Tuple[int, ...] = None):
    """ONE jitted computation for a full TDVP-PS site visit: forward Lanczos
    expm -> economy QR split -> environment update -> backward bond expm ->
    neighbor rotation.  The unfused path costs ~8 dispatches/site at ~1 ms
    relay latency each; this is the TDVP analog of the DMRG sweep's
    zero-sync static selection.

    Quantum numbers.  With a single full sector (spin-boson chains, any
    model without conserved charges) ``row_ids``/``col_ids`` are None and
    one plain economy QR is exact.  With real sector structure the local
    matrix is qn-block-sparse: the QR runs PER SECTOR, statically unrolled
    inside the same jitted computation (sector index sets are host-known
    constants), so sector purity holds by construction — including for
    rank-deficient blocks from ``expand_bond_dimension``-padded states —
    and it is still ONE device dispatch.  A canonical MPS bond never
    exceeds the product of the dims beside it, so every kept column keeps
    its qn and ``mps.qn`` stays exactly as it was: no bookkeeping, no
    device sync.  (One full-matrix QR with a block mask is NOT enough: for
    a rank-deficient block, Householder places the deficient directions in
    other sectors at O(1) magnitude, and masking then zeroes live columns —
    observed as NaNs two sites later via a zero-norm Lanczos start.)
    """
    sectors = None
    if row_ids is not None:
        rid = np.asarray(row_ids)
        cid = np.asarray(col_ids)
        k = len(cid)
        sectors = []
        for g in np.unique(cid):
            rows_g = np.flatnonzero(rid == g)
            cols_g = np.flatnonzero(cid == g)
            assert len(rows_g) >= len(cols_g) > 0  # guarded by the driver
            sectors.append((tuple(rows_g.tolist()), tuple(cols_g.tolist())))

    @jax.jit
    def run(dt, c, L, W, R, nbr):
        hop1 = _einsum_hop(formula1, (L, W, R), cshape)
        w1, _ = _lanczos_expm(hop1, dt, c.ravel(), m_max1)
        cmat = w1.reshape(m, n)
        qr_in = cmat if to_right else cmat.T        # (rows, k)
        if sectors is None:
            q, rr = jnp.linalg.qr(qr_in)            # (rows, k), (k, k)
        else:
            q = jnp.zeros_like(qr_in)
            rr = jnp.zeros((qr_in.shape[1],) * 2, dtype=qr_in.dtype)
            for rows_g, cols_g in sectors:
                rg = np.asarray(rows_g)
                cg = np.asarray(cols_g)
                sub = qr_in[np.ix_(rg, cg)]
                q_g, r_g = jnp.linalg.qr(sub)
                q = q.at[np.ix_(rg, cg)].set(q_g)
                rr = rr.at[np.ix_(cg, cg)].set(r_g)
        if to_right:
            site = q.reshape(cshape[:-1] + (-1,))
            bond = rr                               # (k, n)
        else:
            site = q.T.reshape((-1,) + cshape[1:])
            bond = rr.T                             # (m, k)
        new_env = jnp.einsum(
            env_formula, L if to_right else R,
            site.conj(), W, site, optimize="optimal")
        if not has_backward:
            return site, new_env, nbr
        if to_right:
            hop0 = _einsum_hop(formula0, (new_env, R), bond.shape)
        else:
            hop0 = _einsum_hop(formula0, (L, new_env), bond.shape)
        w0, _ = _lanczos_expm(hop0, -dt, bond.ravel(), m_max0)
        bond_t = w0.reshape(bond.shape)
        if to_right:
            nbr_new = jnp.tensordot(bond_t, nbr, axes=1)
        else:
            nbr_new = jnp.tensordot(nbr, bond_t, axes=1)
        return site, new_env, nbr_new

    return run


def tdvp_ps_site_fused(dt, c, ltensor, w, rtensor, neighbor, cshape,
                       m: int, n: int, to_right: bool, has_backward: bool,
                       max_m: int = 30, qnbigl=None, qnbigr=None,
                       qntot=None):
    """Driver for :func:`_tdvp_ps_site_factory`; see the factory docstring.
    ``m``/``n`` are the QR split dimensions (host-known).  For qn-structured
    sites pass ``qnbigl``/``qnbigr``/``qntot``; the bond qn assignment is
    provably unchanged by the 1-site split, so the caller keeps its ``qn``
    arrays as they are.  Returns ``(site, new_env, new_neighbor)``, or
    ``None`` when the qn structure is infeasible for the in-graph split
    (a bond sector wider than its free-leg support) — caller falls back to
    the unfused path."""
    from renormalizer_tpu.ops.contract import (
        _ENV_FORMULAS, _HOP_FORMULAS, safe_asarray)

    formula1 = _HOP_FORMULAS[(1, False, False)][0]
    formula0 = _HOP_FORMULAS[(0, False, False)][0]
    env_formula = _ENV_FORMULAS[("L" if to_right else "R", 3)]
    k = min(m, n)
    row_ids = col_ids = None
    if qnbigl is not None:
        qntot = np.atleast_1d(np.asarray(qntot))
        ql = np.asarray(qnbigl).reshape(-1, len(qntot))
        # left-accumulated qn of the right-side legs
        qr_ = qntot[None, :] - np.asarray(qnbigr).reshape(-1, len(qntot))
        rows, cols = (ql, qr_) if to_right else (qr_, ql)
        if len(cols) != k:
            return None  # bond wider than its free legs: not canonical
        # map qn vectors to small integer sector ids (shared map so equal
        # vectors on the two axes get equal ids)
        both = np.concatenate([rows, cols])
        _, inv = np.unique(both, axis=0, return_inverse=True)
        row_ids = tuple(inv[: len(rows)].tolist())
        col_ids = tuple(inv[len(rows):].tolist())
        r_counts = np.bincount(row_ids, minlength=int(inv.max()) + 1)
        c_counts = np.bincount(col_ids, minlength=int(inv.max()) + 1)
        if (c_counts > r_counts).any():
            return None  # a bond sector exceeds its row support
    fn = _tdvp_ps_site_factory(
        formula1, env_formula, formula0, tuple(cshape), m, n,
        bool(to_right), bool(has_backward),
        int(min(max_m, m * n)), int(min(max_m, k * (n if to_right else m))),
        row_ids, col_ids,
    )
    if not isinstance(dt, jax.Array):
        dt = complex(dt)
        dt = dt.real if dt.imag == 0 else dt
    return fn(safe_asarray(dt), safe_asarray(c), safe_asarray(ltensor),
              safe_asarray(w), safe_asarray(rtensor), safe_asarray(neighbor))


# ---------------------------------------------------------------------------
# adaptive RKF45 initial-value solver
# ---------------------------------------------------------------------------

class IvpResult(NamedTuple):
    y: jnp.ndarray
    t: float
    nfev: int
    nsteps: int


# Fehlberg 4(5) coefficients
_FB_A = np.array(
    [
        [0, 0, 0, 0, 0],
        [1 / 4, 0, 0, 0, 0],
        [3 / 32, 9 / 32, 0, 0, 0],
        [1932 / 2197, -7200 / 2197, 7296 / 2197, 0, 0],
        [439 / 216, -8, 3680 / 513, -845 / 4104, 0],
        [-8 / 27, 2, -3544 / 2565, 1859 / 4104, -11 / 40],
    ]
)
_FB_C = np.array([0, 1 / 4, 3 / 8, 12 / 13, 1, 1 / 2])
_FB_B5 = np.array([16 / 135, 0, 6656 / 12825, 28561 / 56430, -9 / 50, 2 / 55])
_FB_B4 = np.array([25 / 216, 0, 1408 / 2565, 2197 / 4104, -1 / 5, 0])


@jax.jit
def _rk_step_finish(y, ks, dt, atol, rtol):
    """Assemble the 5th/4th order solutions and the per-component-scaled
    RMS error (SciPy's ``atol + rtol * max(|y0|, |y1|)`` rule,
    ref ``lib/integrate/_ivp/rk.py``) in ONE device dispatch."""
    b5 = jnp.asarray(_FB_B5).astype(ks.dtype)
    b4 = jnp.asarray(_FB_B4).astype(ks.dtype)
    y5 = y + dt * jnp.tensordot(b5, ks, axes=1)
    y4 = y + dt * jnp.tensordot(b4, ks, axes=1)
    scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
    err = jnp.sqrt(jnp.mean(jnp.abs((y5 - y4) / scale) ** 2))
    return y5, err


def _select_initial_step(fun, t0, y0, f0, direction, rtol, atol):
    """SciPy's empirical initial-step rule (``_ivp/common.py``) — matching it
    keeps our accepted-step counts comparable to the reference's."""
    scale = atol + rtol * jnp.abs(y0)
    d0 = float(jnp.sqrt(jnp.mean(jnp.abs(y0 / scale) ** 2)))
    d1 = float(jnp.sqrt(jnp.mean(jnp.abs(f0 / scale) ** 2)))
    h0 = 1e-6 if d0 < 1e-5 or d1 < 1e-5 else 0.01 * d0 / d1
    y1 = y0 + h0 * direction * f0
    f1 = jnp.asarray(fun(t0 + h0 * direction, y1))
    d2 = float(jnp.sqrt(jnp.mean(jnp.abs((f1 - f0) / scale) ** 2))) / h0
    if d1 <= 1e-15 and d2 <= 1e-15:
        h1 = max(1e-6, h0 * 1e-3)
    else:
        h1 = (0.01 / max(d1, d2)) ** 0.2  # order 4+1
    return min(100 * h0, h1)


def solve_ivp(fun, t_span, y0, rtol=1e-3, atol=1e-6, max_steps=100000,
              first_step=None, max_step=np.inf):
    """Adaptive RKF45 integration of ``dy/dt = fun(t, y)`` from ``t_span[0]``
    to ``t_span[1]`` (final state only — the evolution schemes never need the
    dense output).

    The controller is host-driven because ``fun`` (the TDVP-VMF equation of
    motion) contains host-side environment bookkeeping, but all vector math
    runs on device and exactly ONE scalar (the scaled error) is fetched per
    attempted step.  Error control is per-component ``atol + rtol*|y|`` with
    SciPy's initial-step heuristic and step-factor clamps, so accepted-step
    counts track the reference's vendored ``solve_ivp``."""
    from renormalizer_tpu.ops.contract import safe_asarray

    t0, t1 = t_span
    y = safe_asarray(y0)
    direction = np.sign(t1 - t0) if t1 != t0 else 1.0
    span = abs(t1 - t0)
    if span == 0:
        return IvpResult(y, t0, 0, 0)
    nfev = 0
    if first_step is not None:
        h = first_step
    else:
        f0 = safe_asarray(fun(t0, y))
        h = _select_initial_step(fun, t0, y, f0, direction, rtol, atol)
        nfev += 2
    h = min(h, span, max_step)
    t = t0
    nsteps = 0
    while (t - t1) * direction < 0 and nsteps < max_steps:
        h = min(h, abs(t1 - t), max_step)
        dt = direction * h
        ks = []
        for i in range(6):
            yi = y
            for j in range(i):
                if _FB_A[i, j] != 0:
                    yi = yi + dt * _FB_A[i, j] * ks[j]
            ks.append(safe_asarray(fun(t + _FB_C[i] * dt, yi)))
            nfev += 1
        y5, err_dev = _rk_step_finish(y, jnp.stack(ks), dt, atol, rtol)
        err = float(err_dev)  # the single host sync per attempted step
        if not np.isfinite(err):
            # NaN/Inf from the RHS: shrink aggressively, count as a step
            # attempt so a divergent RHS cannot loop forever
            h = h * 0.1
            nsteps += 1
            if h < span * 1e-14:
                raise FloatingPointError(
                    "solve_ivp: right-hand side produced non-finite values"
                )
            continue
        if err <= 1.0 or h <= span * 1e-12:
            t = t + dt
            y = y5
            nsteps += 1
            factor = 10.0 if err == 0 else min(10.0, max(0.2, 0.9 * err ** (-0.2)))
            h = h * factor
        else:
            h = h * max(0.2, 0.9 * err ** (-0.2))
    return IvpResult(y, t, nfev, nsteps)
