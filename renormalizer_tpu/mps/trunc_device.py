r"""On-device quantum-number-blocked truncation (randomized, sector-pure).

Replaces the host-LAPACK SVD in DMRG site updates (reference
``renormalizer/mps/svd_qn.py:99-240`` semantics).  The design is driven by
two measured facts about the target hardware:

* the host has a single weak CPU (a 770x770 ``sgesdd`` costs ~600 ms) and the
  device<->host tunnel moves ~30-60 MB/s with ~27 ms per blocking round trip,
  so fetching the local coefficient tensor and factorizing it on the host
  dominates the steady-state sweep;
* on the TPU, dense SVD/eigh of the full local matrix is slow (QDWH, ~70 ms
  at 1536^2) but matmuls and small eigh are essentially free.

So the factorization is a *randomized range finder per quantum-number
sector*, built only from MXU-friendly matmuls, Householder QR and one small
projected eigh:

    Y   = A @ Omega                 (range sketch, l1 columns)
    Y   = qr(Y); Y = A (A^H Y)      (power iteration, sharpens the sketch)
    Q   = qr([Y | Omega_c])         (orthonormal candidates; Omega_c adds
                                     in-sector complement columns for
                                     percent-based state allocation)
    B   = Q^H A;  G = B B^H
    lam, W = eigh(G);  U = Q W      (Rayleigh-Ritz: candidates sorted by
                                     projected singular value)

Each sector runs as its own (async) dispatch, so candidates are exactly
sector-pure by construction — no cross-sector degeneracy hazards — and the
only device->host traffic per site update is the ~KB vector of candidate
singular values used by ``select_basis``.  When the sketch width reaches the
sector rank the factorization is exact; otherwise it captures the top
``cap + OVERSAMPLE`` states, which is all a truncation to ``cap`` states can
keep (the result stays variational either way).

The selected basis is applied on device: ``ms = U[:, idx]`` and
``comp = ms^H C`` (to_right; mirrored for to_left), so the renormalized
factors never leave HBM.
"""

from functools import lru_cache
from typing import List, Tuple

import numpy as np

from renormalizer_tpu.backend import backend

OVERSAMPLE = 32


def linalg_enabled(arr=None) -> bool:
    """Generic gate for on-device qn-blocked factorizations (QR path).

    ``RENO_DEVICE_TRUNC=1`` forces on, ``0`` forces off; defaults to on for
    accelerator backends.  When ``arr`` is given and is complex while
    ``RENO_SPLIT_COMPLEX=1`` (no complex dtypes may reach the device
    compiler), the device path reports itself unavailable so call sites fall
    back to the host factorization."""
    import os

    if arr is not None and os.environ.get("RENO_SPLIT_COMPLEX", "") == "1":
        import numpy as _np

        if _np.iscomplexobj(arr):
            return False
    flag = os.environ.get("RENO_DEVICE_TRUNC", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    import jax

    return jax.default_backend() != "cpu"


def compress_factors(coef_array, qnbigl, qnbigr, qntot, system: str,
                     want_exact: bool = False):
    """Device qn-blocked SVD factors for :meth:`MatrixProduct.compress`,
    API-compatible with ``svd_qn(..., full_matrices=False)``:
    ``(u, sigma, qnl_list, v, sigma, qnr_list)`` globally sorted by
    descending singular value.  ``u``/``v`` are device matrices; only the
    candidate spectrum is transferred.

    Uses full-rank candidates (exact factorization) up to rank 2048, a
    rank-1024 sketch above — returns ``None`` in the rare saturated case so
    the caller falls back to the host path.  ``want_exact`` callers (e.g. the
    TDVP-VMF gauge rotation, which reshapes the right factor back into the
    full tensor shape) refuse sketch mode outright: they get ``None``
    whenever the factorization could legitimately return fewer than
    ``min(m, n)`` columns.
    """
    import jax.numpy as jnp

    qntot = np.atleast_1d(np.asarray(qntot))
    qn_size = len(qntot)
    m = int(np.asarray(qnbigl).reshape(-1, qn_size).shape[0])
    n = int(np.asarray(qnbigr).reshape(-1, qn_size).shape[0])
    rank = min(m, n)
    if want_exact and rank > 2048:
        return None  # sketch mode cannot guarantee a full-rank factorization
    cap = rank if rank <= 2048 else 1024
    parts, sigma, qn_kept, parts_v = candidates(
        coef_array, qnbigl, qnbigr, qntot, system, cap, want_complement=False,
        want_v=True,
    )
    order = np.argsort(-sigma, kind="stable")
    sigma = sigma[order]
    if cap < rank and len(sigma) and sigma[-1] > 1e-10 * sigma[0]:
        return None  # sketch may have missed live states: host fallback
    from renormalizer_tpu.ops.contract import _harmonize_devices

    sel = jnp.asarray(np.asarray(order, dtype=np.int32))
    run = _gather_pair_factory(len(parts))
    a_side, b_side = run(*_harmonize_devices([sel, *parts, *parts_v]))
    if system == "L":
        # kernel: C = a_side diag(sigma) b_side^H; host convention v = conj(V)
        u = a_side
        v = b_side.conj()
        qnl_list = [tuple(q) for q in (np.asarray(qn_kept)[order])]
        qnr_list = [tuple(np.asarray(qntot) - np.asarray(q)) for q in qnl_list]
    else:
        # kernel ran on C^T: a_side = conj(V_C) (Vset), b_side = conj(U_C)
        v = a_side
        u = b_side.conj()
        qnr_list = [tuple(q) for q in (np.asarray(qn_kept)[order])]
        qnl_list = [tuple(np.asarray(qntot) - np.asarray(q)) for q in qnr_list]
    return u, sigma, qnl_list, v, sigma, qnr_list


@lru_cache(maxsize=None)
def _qr_factory(m: int, n: int, ml: int, nr: int, transpose: bool,
                dtype_name: str):
    """Jitted per-sector economy QR (or RQ when ``transpose``), scattered back
    into the full row/column spaces.  Fully deterministic shapes — no
    device->host traffic at all."""
    import jax
    import jax.numpy as jnp

    k = min(ml, nr)

    @jax.jit
    def run(cmat, gr, gc):
        block = cmat[gr][:, gc]  # (ml, nr)
        if not transpose:
            q, r = jnp.linalg.qr(block, mode="reduced")
            pu, pv = q, r.T  # (ml, k), (nr, k)
        else:
            # RQ via QR of the flipped transpose (same as the host path)
            q, r = jnp.linalg.qr(block[::-1, ::-1].T, mode="reduced")
            pu = r[::-1, ::-1].T  # (ml, k) upper-left triangular factor
            pv = q[::-1, ::-1]    # (nr, k) row-orthonormal factor, transposed
        u_out = jnp.zeros((m, k), dtype=cmat.dtype).at[gr].set(pu)
        v_out = jnp.zeros((n, k), dtype=cmat.dtype).at[gc].set(pv)
        return u_out, v_out

    return run


def qr_qn_device(coef_array, qnbigl, qnbigr, qntot, system: str):
    """On-device qn-blocked economy QR, API-compatible with
    ``svd_qn.svd_qn(..., QR=True, full_matrices=False)``:
    returns ``(u, qnl_list, v, qnr_list)`` with device ``u`` (m, K) /
    ``v`` (n, K).  Runs entirely asynchronously (qn output is determined by
    the host-known sector shapes)."""
    import jax.numpy as jnp

    from renormalizer_tpu.mps.svd_qn import _sector_indices

    qntot = np.atleast_1d(np.asarray(qntot))
    qn_size = len(qntot)
    localqnl = np.asarray(qnbigl).reshape(-1, qn_size)
    localqnr = np.asarray(qnbigr).reshape(-1, qn_size)
    m, n = len(localqnl), len(localqnr)
    sectors = _sector_indices(localqnl, localqnr, qntot)
    if len(sectors) == 0:
        raise ValueError("Invalid quantum number")

    cmat = jnp.asarray(coef_array).reshape(m, n)
    parts_u, parts_v = [], []
    qnl_list: List[tuple] = []
    qnr_list: List[tuple] = []
    for nl, lset, rset in sectors:
        ml, nr = len(lset), len(rset)
        run = _qr_factory(m, n, ml, nr, system == "R", str(cmat.dtype))
        pu, pv = run(cmat, _device_idx(lset.astype(np.int32)),
                     _device_idx(rset.astype(np.int32)))
        parts_u.append(pu)
        parts_v.append(pv)
        k = min(ml, nr)
        qnl_list.extend([tuple(nl)] * k)
        qnr_list.extend([tuple(np.asarray(qntot) - nl)] * k)
    u = parts_u[0] if len(parts_u) == 1 else jnp.concatenate(parts_u, axis=1)
    v = parts_v[0] if len(parts_v) == 1 else jnp.concatenate(parts_v, axis=1)
    return u, qnl_list, v, qnr_list


def _orth(z):
    """Orthonormalize columns; exact even for rank-deficient input.

    Householder QR is backward stable and completes deficient directions
    with arbitrary orthonormal columns — which is exactly what the
    complement states need.  Because each kernel operates on the gathered
    rows of ONE quantum-number sector, row mixing cannot break sector
    purity, and XLA's QR is matmul-based and fast on the MXU."""
    import jax.numpy as jnp

    return jnp.linalg.qr(z, mode="reduced")[0]


def _orth_cholqr(z):
    """Shifted CholeskyQR3 orthogonalization (Fukaya et al. 2020): one
    shifted pass + two plain passes, built ONLY from syrk/cholesky/trsm —
    every step blocked matmuls on the MXU, no Householder QR.  The shift
    makes the first Cholesky safe for ill-conditioned sketches; a final
    in-kernel orthogonality check falls back to Householder QR (lax.cond,
    so the slow branch only ever *executes* on pathological inputs —
    spectra graded beyond ~1/sqrt(eps), where plain Cholesky passes break
    down).  Columns in the (numerical) null space come out
    orthonormal-but-arbitrary exactly like Householder QR's, with
    Rayleigh-Ritz weight ~0, so downstream selection is unchanged."""
    import jax
    import jax.numpy as jnp

    eps = jnp.finfo(z.real.dtype).eps
    l = z.shape[1]
    eye = jnp.eye(l, dtype=z.dtype)

    def one_pass(q, shift):
        g = q.conj().T @ q
        tr = jnp.trace(g).real
        gs = g + (shift * tr + eps * eps) * eye
        L = jnp.linalg.cholesky(gs)
        return jax.lax.linalg.triangular_solve(
            L, q, left_side=False, lower=True, transpose_a=True,
            conjugate_a=True,
        )

    q = one_pass(z, 11.0 * eps)
    q = one_pass(q, 0.0)
    q = one_pass(q, 0.0)
    err = jnp.linalg.norm(q.conj().T @ q - eye)
    bad = jnp.isnan(err) | (err > 100.0 * eps * l)
    return jax.lax.cond(bad, lambda: jnp.linalg.qr(z, mode="reduced")[0],
                        lambda: q)


def _colnormalize(y):
    """Scale each column of ``y`` to (at most) unit norm before
    orthogonalization.  Column scaling cannot change the computed range
    basis, but it is load-bearing for correctness on TPU: the power
    iteration ``Y = A (A^H Q1)`` scales columns by sigma^2, and XLA:TPU's
    f32 Householder QR produces a catastrophically non-orthonormal Q
    (column norms in the hundreds, measured orth error ~1e5) when fed
    columns with norms near 1e-13.  At unit scale, rank-deficient columns
    have f32-noise-level residuals (~1e-7 relative) which the QR handles
    correctly, completing them with arbitrary orthonormal directions as
    intended.  Columns that are exactly zero (bucketed pad slots) stay
    zero."""
    import jax.numpy as jnp

    norms = jnp.linalg.norm(y, axis=0, keepdims=True)
    tiny = jnp.finfo(y.real.dtype).tiny
    return y / jnp.maximum(norms, tiny ** 0.5)


def exact_cap() -> int:
    """Rank bound below which threshold-criteria truncations use exact
    (full-rank) device candidates; above it they switch to a sketch of
    width :func:`sketch_cap` with an exact-Frobenius-norm correction
    (``RENO_TRUNC_EXACT_CAP``, default 2048 — the point where the exact
    per-sector kernels start to dominate the update)."""
    import os

    return int(os.environ.get("RENO_TRUNC_EXACT_CAP", "2048"))


def sketch_cap() -> int:
    """Sketch width for threshold-criteria truncations beyond
    :func:`exact_cap` (``RENO_TRUNC_SKETCH_CAP``, default 1024, matching
    :func:`compress_factors`' sketch mode)."""
    import os

    return int(os.environ.get("RENO_TRUNC_SKETCH_CAP", "1024"))


@lru_cache(maxsize=None)
def _frob2_factory(shape: tuple, dtype_name: str):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c):
        return jnp.sum(jnp.abs(c) ** 2).real

    return run


def frob_norm(arr) -> float:
    """Exact Frobenius norm of the (device) coefficient tensor — one scalar
    fetch.  Used to normalize a sketched candidate spectrum exactly: the
    sketch misses the tail of sigma, but ``||A||_F`` needs no
    factorization at all."""
    import jax.numpy as jnp

    a = jnp.asarray(arr)
    run = _frob2_factory(tuple(a.shape), str(a.dtype))
    return float(np.sqrt(np.asarray(run(a))))


def bucket_quant() -> int:
    """Shape-bucket quantum for the per-sector candidate kernels
    (``RENO_TRUNC_BUCKET``, default 64; ``1`` disables bucketing).

    Sector dimensions drift between sweeps, and every exact (ml, nr, l1)
    combination is its own XLA executable: the round-3 hardware profile
    measured ~41 recompiles = ~10 s *per steady-state sweep* from this
    drift (compiles over the tunnel cost 0.5-1.5 s each).  Padding each
    sector to multiples of the quantum collapses the executable count and
    absorbs the drift; the pad rows/columns are exact zeros (masked gather,
    scatter-add) so the candidates are unchanged."""
    import os

    return int(os.environ.get("RENO_TRUNC_BUCKET", "64"))


def lam_to_sigma(lam) -> np.ndarray:
    """Candidate spectrum (host): sqrt of the projected eigenvalues, with
    the bucketed kernels' pad slots (marked ``lam < 0``) kept at -1 so
    selection can never retain them."""
    lam = np.asarray(lam)
    return np.where(lam < 0, -1.0, np.sqrt(np.maximum(lam, 0.0)))


def _candidate_core(l1p: int, eigh_impl: str, orth_impl: str):
    """Randomized range finder + Rayleigh-Ritz on one (masked) sector block
    ``a``: returns (candidates (rows, l1p), lam (l1p,) descending).  Pad
    candidate slots (>= the real sketch width ``l1_real``, a traced scalar)
    and any column whose in-sector mass was lost to masking report
    ``lam = -1``."""
    import jax
    import jax.numpy as jnp

    orth = _orth_cholqr if orth_impl == "cholqr" else _orth

    def pre(a, mask_a, l1_real, key):
        """Range finder: everything up to the Rayleigh-Ritz Gram matrix.
        Returns (q, g); the eigh of g is dispatched by the caller so that
        batched factories can route it through the Pallas Jacobi kernel
        with ``lax.map`` (vmap-of-pallas trips Mosaic's block-shape rules,
        and XLA's batched QDWH eigh costs ~20x more device time)."""
        rbp = a.shape[1]
        key_w, key_r = jax.random.split(key)
        omega = jax.random.normal(key_w, (rbp, l1p), dtype=jnp.float32).astype(a.dtype)
        y = orth(a @ omega)
        y = a @ (a.conj().T @ y)
        col_ok = jnp.arange(l1p) < l1_real
        yn = _colnormalize(y)
        # In-sector completion regularizer: below the dtype's numerical
        # rank the power-iterated columns are linearly dependent, and
        # Householder QR then completes with junk directions spread over
        # ALL rows — including rows OUTSIDE the sector when ``a`` is a
        # full-extent masked block (the mask-only batched kernel).  Masking
        # those columns afterwards destroys their norm and mutual
        # orthogonality, which is how the masked kernel corrupted the DMRG
        # basis at f32.  Adding a tiny random component confined to the
        # sector's rows (Householder preserves exact-zero rows, so nothing
        # can leak out) makes every completion direction an in-sector
        # orthonormal vector; the Rayleigh-Ritz below re-extracts the
        # genuine spectrum from the span, so the perturbation only costs
        # O(eps^1.5) in the candidates.
        finfo = jnp.finfo(yn.dtype)
        key_r1, key_r2 = jax.random.split(key_r)
        reg = jax.random.normal(key_r1, yn.shape, dtype=jnp.float32).astype(yn.dtype)
        yn = yn + reg * (mask_a[:, None].astype(yn.dtype) * (finfo.eps ** 0.75))
        q = orth(yn)
        # Re-confine + re-orthonormalize: even with in-sector input,
        # Householder QR writes reflection residue onto its PIVOT rows —
        # which are out-of-sector rows in a full-extent masked block — so at
        # the dtype's rank edge a nearly-dependent column's normalized
        # residual leaks out of the sector at O(0.1) (measured at f32).
        # Masking plus two shifted CholeskyQR passes restores exact sector
        # support: every output column is a linear combination of masked
        # columns, and the refinement of an almost-orthonormal basis is
        # stable (kappa ~ 1), so orthonormality lands at roundoff.
        q = q * mask_a[:, None].astype(q.dtype)
        # Replace fully-leaked columns with fresh random IN-SECTOR columns
        # before re-orthonormalizing.  XLA:TPU's blocked Householder QR can
        # complete a rank-edge column almost entirely on out-of-sector rows
        # (measured: 16 of 64 slots lost on v5e where CPU LAPACK lost none),
        # and a column whose masked norm is ~0 cannot be recovered by the
        # CholeskyQR refinement (the shift dominates).  A random in-sector
        # column carries no less information than QR's junk direction, and
        # after the refinement it becomes an orthonormal completion of the
        # genuine span with Rayleigh-Ritz weight ~0 — so every slot under
        # col_ok is ALWAYS a unit in-sector basis vector and slot validity
        # is layout-deterministic (exactly what the async static-selection
        # plan requires).  Genuine columns (masked norm ~1) are untouched.
        colnorm2 = jnp.sum(jnp.abs(q) ** 2, axis=0).real
        reg2 = (jax.random.normal(key_r2, q.shape, dtype=jnp.float32)
                .astype(q.dtype) * mask_a[:, None].astype(q.dtype))
        colok_f = col_ok[None, :].astype(q.dtype)
        q = jnp.where((colnorm2 < 0.5)[None, :], reg2, q) * colok_f
        eye_r = jnp.eye(l1p, dtype=q.dtype)
        # shifted-CholeskyQR3 schedule: only the FIRST pass carries the
        # stabilizing shift (16 eps tr(G) ~ 1e-4 at l1p=96/f32 — re-adding
        # it every pass floors the achievable orthonormality at the shift
        # itself); clean-up passes run with a vanishing shift and land at
        # roundoff.  The structural columns (beyond l1_real) are re-zeroed
        # INSIDE every pass: the triangular solve mixes earlier columns
        # into later ones, and without the re-zeroing the next pass's Gram
        # matrix is exactly singular (NaN from an unshifted Cholesky).
        # With it, every Gram is [G_ok, 0] + shift*I — always PD.
        for ipass in range(3):
            gq = q.conj().T @ q
            shift = (16 * finfo.eps * jnp.trace(gq).real if ipass == 0
                     else 0.0) + finfo.tiny
            lq = jnp.linalg.cholesky(gq + shift * eye_r)
            q = jax.lax.linalg.triangular_solve(
                lq, q, left_side=False, lower=True, transpose_a=True,
                conjugate_a=True) * colok_f
        # Structural-junk columns (sketch slots beyond the sector's rank
        # bound l1_real) are zeroed EXACTLY before the Rayleigh-Ritz: their
        # rows of b then vanish, g decouples into [g_real, 0], and eigh
        # cannot rotate junk directions into genuine eigenvectors through
        # the near-degenerate tail (lam_real ~ eps^2 vs lam_junk ~ 0 has no
        # spectral gap — without the hard zero, the mixing angle is O(1) and
        # the async stale-plan selection can pick a corrupted column, which
        # is how the masked/batched kernels broke qn purity in DMRG).
        q = q * col_ok[None, :].astype(q.dtype)
        b = q.conj().T @ a
        g = b @ b.conj().T
        # Structural-aware spectral shift: the genuine tail eigenvalues of
        # g = B B^H come out as tiny NEGATIVES at f32 roundoff, which sorts
        # them below the structural-zero block and lets zero-eigenvectors
        # interleave the valid slot range (measured: ~8 slots/sector lost
        # under the Jacobi eigh on v5e).  Adding delta on the non-structural
        # diagonal shifts every genuine eigenvalue by exactly delta while
        # the structural block stays exactly 0 — eigenvectors are unchanged
        # (the shift commutes with g) and post subtracts delta back, so the
        # reported spectrum is unbiased and the ordering is deterministic.
        delta = 4 * finfo.eps * jnp.trace(g).real + finfo.tiny
        g = g + jnp.eye(l1p, dtype=g.dtype) * (delta * col_ok.astype(g.dtype))[None, :]
        return q, g, delta

    def post(q, mask_a, l1_real, lam, w, delta):
        """Rotate the range basis by the eigenvectors and grade/sentinel
        the candidate slots (``lam``/``w`` in eigh's ascending order)."""
        col_ok = jnp.arange(l1p) < l1_real
        lam = jnp.nan_to_num(jnp.maximum(lam[::-1] - delta, 0))
        u = q @ w[:, ::-1]
        vals = u * mask_a[:, None].astype(u.dtype)
        # a valid candidate keeps (almost) all its mass on real rows; a
        # Householder-QR junk column (rank-deficient sector) can leak onto
        # pad rows and lose norm when masked — mark it unselectable
        colmass = jnp.sum(jnp.abs(vals) ** 2, axis=0).real
        slot_ok = col_ok & (colmass > 0.5)
        lam = jnp.where(slot_ok, lam, -1.0)
        # Renormalize the masked columns: slot validity (colmass) is
        # data-dependent, and in async mode the one-sweep-stale plan may
        # select a slot whose mass has since drifted — a sub-unit column in
        # the renormalized basis would silently break canonical form.  A
        # unit-norm in-sector vector is always a legitimate basis member
        # (orthogonality to the genuine eigenvector columns is preserved by
        # the masking, see docstring).
        scale = jnp.where(colmass > 0.25,
                          1.0 / jnp.sqrt(jnp.maximum(colmass, 0.25)), 1.0)
        vals = vals * scale[None, :].astype(vals.dtype)
        # Sink sentinel slots to the end (stable descending sort; sentinels
        # carry lam = -1).  Without this, an eigensolver that reports a
        # genuine tail eigenvalue as a tiny NEGATIVE (Jacobi at f32) sorts
        # it below the structural zeros, so invalid slots interleave the
        # valid range and the slot layout stops being deterministic — which
        # both drifts the qn pattern (endless recompiles) and breaks the
        # async plan's static first-k_i selection.
        order = jnp.argsort(-lam, stable=True)
        return vals[:, order], lam[order]

    def core(a, mask_a, l1_real, key):
        q, g, delta = pre(a, mask_a, l1_real, key)
        lam, w = _eigh_one(g, eigh_impl)
        return post(q, mask_a, l1_real, lam, w, delta)

    core.pre = pre
    core.post = post
    return core


def _eigh_xla_padded(g):
    """XLA eigh of a PSD Rayleigh-Ritz Gram matrix, zero-padded to the next
    lane-aligned (128-multiple) size; returns the TOP ``n0`` eigenpairs in
    ascending order, restricted to the original coordinates.

    QDWH on TPU is catastrophically slow at unaligned sizes (157 ms vs 7 ms
    at 256^2, v5e) — padding recovers the aligned speed.  Exactness: the
    padded rows/columns are exact zeros, so the zero eigenspace is spanned
    by coordinate axes and never mixes with the genuine spectrum — the
    ``delta`` diagonal shift in :func:`_candidate_core` keeps every genuine
    eigenvalue >= delta > 0, so the dropped bottom ``n - n0`` entries are
    all exact structural/pad zeros and the kept eigenvectors have exactly
    zero support on the pad coordinates."""
    import jax.numpy as jnp

    n0 = g.shape[-1]
    n = -(-n0 // 128) * 128
    if n == n0:
        return jnp.linalg.eigh(g)
    pad = [(0, 0)] * (g.ndim - 2) + [(0, n - n0), (0, n - n0)]
    lam, w = jnp.linalg.eigh(jnp.pad(g, pad))
    return lam[..., n - n0:], w[..., :n0, n - n0:]


def _eigh_one(g, eigh_impl: str):
    """Eigendecomposition of one symmetric matrix (ascending order).

    Routes ``eigh_impl == "jacobi"`` through the Pallas kernel only when
    its scoped-VMEM footprint fits the 16 MiB hardware limit; above that
    Mosaic rejects the whole executable at compile time (hit at Gram size
    1056/f32 in the M=512 DMRG bench), so large problems fall back to the
    lane-aligned padded XLA eigh."""
    import jax.numpy as jnp

    if eigh_impl == "jacobi":
        from renormalizer_tpu.ops.jacobi import jacobi_eigh, jacobi_fits_vmem

        if jacobi_fits_vmem(g.shape[0], g.dtype):
            return jacobi_eigh(g)
        return _eigh_xla_padded(g)
    return jnp.linalg.eigh(g)


def _eigh_batched(g_b, eigh_impl: str):
    """Eigendecomposition of a stacked batch of symmetric matrices.

    The Pallas Jacobi kernel cannot be vmapped (Mosaic block-shape rules),
    but it also doesn't need to be: ``lax.map`` keeps the whole batch inside
    one executable, and on the measured shapes (4 x 256 @ f32, v5e) the
    mapped Jacobi runs ~10x faster than XLA's vmapped QDWH eigh."""
    import jax
    import jax.numpy as jnp

    if eigh_impl == "jacobi":
        from renormalizer_tpu.ops.jacobi import jacobi_eigh, jacobi_fits_vmem

        if jacobi_fits_vmem(g_b.shape[-1], g_b.dtype):
            return jax.lax.map(lambda g: jacobi_eigh(g), g_b)
        if g_b.shape[-1] % 128 != 0:
            return _eigh_xla_padded(g_b)
    return jax.vmap(jnp.linalg.eigh)(g_b)


def _bucketed_body(l1p: int, transpose: bool, rows_out: int,
                   eigh_impl: str, orth_impl: str):
    """Shared candidate-kernel body for the bucketed factories: gather one
    (padded) sector block, run :func:`_candidate_core`, scatter the
    candidates back into the full row space."""
    import jax.numpy as jnp

    core = _candidate_core(l1p, eigh_impl, orth_impl)

    def pre(cmat, gr, gc, mask_r, mask_c, l1_real, key):
        block = cmat[gr][:, gc] * (mask_r[:, None] * mask_c[None, :])
        a = block.T if transpose else block           # (rap, rbp)
        mask_a = mask_c if transpose else mask_r      # rows of a
        return core.pre(a, mask_a, l1_real, key)

    def post(gr, gc, mask_r, mask_c, l1_real, q, lam, w, delta):
        mask_a = mask_c if transpose else mask_r
        scatter_idx = gc if transpose else gr
        vals, lam = core.post(q, mask_a, l1_real, lam, w, delta)
        out = jnp.zeros((rows_out, l1p), dtype=vals.dtype).at[scatter_idx].add(vals)
        return out, lam

    def run(cmat, gr, gc, mask_r, mask_c, l1_real, key):
        q, g, delta = pre(cmat, gr, gc, mask_r, mask_c, l1_real, key)
        lam, w = _eigh_one(g, eigh_impl)
        return post(gr, gc, mask_r, mask_c, l1_real, q, lam, w, delta)

    run.pre = pre
    run.post = post
    return run


@lru_cache(maxsize=None)
def _sector_factory_masked(m: int, n: int, nsec: int, l1p: int,
                           transpose: bool, dtype_name: str,
                           eigh_impl: str = "xla", orth_impl: str = "qr"):
    """Mask-only batched candidate kernel: every sector sees the FULL
    (m, n) coefficient, zeroed outside the sector by per-sector row/column
    masks — no gather, no scatter, no padded-extent bookkeeping.

    The payoff is shape stability: the executable's signature depends only
    on (m, n, nsec, l1p), all of which are fixed per site at a converged
    bond dimension — the qn-sector SPLIT (which drifts for many sweeps
    after the energy converges, and drives an open-ended recompile tail in
    the gather-bucketed kernels whose shapes track the max sector extent)
    never enters compilation.  The extra FLOPs from full-extent padding are
    batched MXU matmuls — cheap where launches and compiles are not.  Used
    when the batch fits the memory budget (:func:`mask_budget`); the
    gather-bucketed batch is the fallback for huge multi-sector sites."""
    import jax
    import jax.numpy as jnp

    rows_out = n if transpose else m
    core = _candidate_core(l1p, eigh_impl, orth_impl)

    def body_pre(cmat, mask_r, mask_c, l1_real, key):
        block = cmat * (mask_r[:, None] * mask_c[None, :])
        a = block.T if transpose else block
        mask_a = mask_c if transpose else mask_r
        return core.pre(a, mask_a, l1_real, key)

    vpre = jax.vmap(body_pre, in_axes=(None, 0, 0, 0, None))
    vpost = jax.vmap(core.post, in_axes=(0, 0, 0, 0, 0, 0))

    @jax.jit
    def run(cmat, mask_r, mask_c, l1_real, key):
        q_b, g_b, d_b = vpre(cmat, mask_r, mask_c, l1_real, key)
        lam_b, w_b = _eigh_batched(g_b, eigh_impl)
        mask_ab = mask_c if transpose else mask_r
        out, lam = vpost(q_b, mask_ab, l1_real, lam_b, w_b, d_b)
        # (nsec, rows_out, l1p) -> (rows_out, nsec*l1p), sector-major
        out = jnp.moveaxis(out, 0, 1).reshape(rows_out, nsec * l1p)
        return out, lam.reshape(-1)

    return run


def mask_budget() -> int:
    """Byte budget for the mask-only batched kernel's (nsec, m, n) blocks
    (``RENO_TRUNC_MASK_BUDGET``, default 256 MB).  Batches beyond it use the
    gather-bucketed batched kernel instead."""
    import os

    return int(os.environ.get("RENO_TRUNC_MASK_BUDGET", str(256 * 2**20)))


@lru_cache(maxsize=None)
def _sector_factory_bucketed(m: int, n: int, mlp: int, nrp: int, l1p: int,
                             transpose: bool, dtype_name: str,
                             eigh_impl: str = "xla", orth_impl: str = "qr"):
    """Bucketed twin of :func:`_sector_factory` (no complement, no right
    factor): the sector block is gathered with PADDED index arrays and
    masked to exact zeros, so one executable serves every sector whose
    (ml, nr) rounds up to (mlp, nrp)."""
    import jax

    rows_out = n if transpose else m
    return jax.jit(_bucketed_body(l1p, transpose, rows_out, eigh_impl,
                                  orth_impl))


@lru_cache(maxsize=None)
def _sector_factory_batched(m: int, n: int, nsec: int, mlp: int, nrp: int,
                            l1p: int, transpose: bool, dtype_name: str,
                            eigh_impl: str = "xla", orth_impl: str = "qr"):
    """ALL sectors of one site update in ONE dispatch: every sector padded
    to the update-wide bucket shape (mlp, nrp) and the bucketed kernel
    vmapped over the stacked sector axis.

    This is the launch-count fix for the relay-attached device: the
    per-sector dispatch chain (~10 sectors x ~3 kernels per update, each
    launch paying tunnel latency) collapses to one executable whose inner
    batch runs back-to-back on device.  The padding costs MXU-friendly
    extra FLOPs, which are cheap; launches are not.  Outputs are reshaped
    to the sector-major concatenated layout the selection step already
    uses: candidates (rows_out, nsec*l1p), lam (nsec*l1p,)."""
    import jax
    import jax.numpy as jnp

    rows_out = n if transpose else m
    body = _bucketed_body(l1p, transpose, rows_out, eigh_impl, orth_impl)
    vpre = jax.vmap(body.pre, in_axes=(None, 0, 0, 0, 0, 0, None))
    vpost = jax.vmap(body.post, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))

    @jax.jit
    def run(cmat, gr, gc, mask_r, mask_c, l1_real, key):
        q_b, g_b, d_b = vpre(cmat, gr, gc, mask_r, mask_c, l1_real, key)
        lam_b, w_b = _eigh_batched(g_b, eigh_impl)
        out, lam = vpost(gr, gc, mask_r, mask_c, l1_real, q_b, lam_b, w_b, d_b)
        # (nsec, rows_out, l1p) -> (rows_out, nsec*l1p), sector-major
        out = jnp.moveaxis(out, 0, 1).reshape(rows_out, nsec * l1p)
        return out, lam.reshape(-1)

    return run


@lru_cache(maxsize=None)
def _sector_factory(m: int, n: int, ml: int, nr: int, l1: int, l2: int,
                    transpose: bool, dtype_name: str, want_v: bool = False,
                    eigh_impl: str = "xla", orth_impl: str = "qr"):
    """Jitted per-sector candidate kernel.

    Takes the full (m, n) coefficient matrix plus the sector's row/column
    gather indices; returns candidates scattered back into the full row
    space (rows = n if ``transpose`` else m) and their projected singular
    values squared, descending.  With ``want_v`` the matching right factor
    is computed too (sign-fixed QR of A^H U — proper orthonormal columns
    even at zero singular value, which plain ``A^H U / sigma`` cannot give).
    """
    import jax
    import jax.numpy as jnp

    orth = _orth_cholqr if orth_impl == "cholqr" else _orth
    rows_out = n if transpose else m
    rows_v = m if transpose else n
    l_total = l1 + l2
    if want_v:
        # the right factor comes from QR of (rb, l); complement candidates
        # beyond the b-side dimension have no right factor
        assert l2 == 0 and l_total <= (ml if transpose else nr)

    @jax.jit
    def run(cmat, gr, gc, key):
        block = cmat[gr][:, gc]  # (ml, nr)
        a = block.T if transpose else block  # (ra, rb)
        ra, rb = a.shape
        k1, k2 = jax.random.split(key)
        omega = jax.random.normal(k1, (rb, l1), dtype=jnp.float32).astype(a.dtype)
        y = orth(a @ omega)
        y = a @ (a.conj().T @ y)
        if l2 > 0:
            extra = jax.random.normal(k2, (ra, l2), dtype=jnp.float32).astype(a.dtype)
            y = jnp.concatenate([y, extra], axis=1)
        q = orth(_colnormalize(y))
        b = q.conj().T @ a  # (l, rb)
        g = b @ b.conj().T
        # unbiased spectral shift (cf. _candidate_core): guarantees every
        # genuine eigenvalue sits strictly above the exact zeros that the
        # lane-aligned padded eigh fallback appends, so the top-l window it
        # returns can never trade a genuine eigenvector for a pad axis
        finfo = jnp.finfo(jnp.zeros((), dtype=g.dtype).real.dtype)
        delta = 4 * finfo.eps * jnp.trace(g).real + finfo.tiny
        g = g + delta * jnp.eye(l_total, dtype=g.dtype)
        lam, w = _eigh_one(g, eigh_impl)
        lam = jnp.nan_to_num(jnp.maximum(lam[::-1] - delta, 0))
        u = q @ w[:, ::-1]  # (ra, l) candidates, descending
        scatter_idx = gc if transpose else gr
        out = jnp.zeros((rows_out, l_total), dtype=cmat.dtype)
        out = out.at[scatter_idx].set(u)
        if not want_v:
            return out, lam
        # right factor: A^H U = V diag(sigma) up to column phases.  QR makes
        # the zero-sigma columns proper orthonormal completions; the diagonal
        # phase of R restores the U<->V pairing (A ~ U diag(sigma) V^H).
        t = a.conj().T @ u  # (rb, l); columns scale with sigma — normalize
        # for the same TPU f32 QR hazard (positive scaling cannot change
        # the R-diagonal phases used for the U<->V pairing below)
        qv, rv = jnp.linalg.qr(_colnormalize(t), mode="reduced")
        d = jnp.diagonal(rv)
        tiny = jnp.finfo(lam.dtype).tiny
        phase = jnp.where(jnp.abs(d) > tiny, d / jnp.maximum(jnp.abs(d), tiny), 1.0)
        vmat = qv * phase[None, :].astype(qv.dtype)
        scatter_v = gr if transpose else gc
        out_v = jnp.zeros((rows_v, l_total), dtype=cmat.dtype)
        out_v = out_v.at[scatter_v].set(vmat)
        return out, lam, out_v

    return run


_IDX_CACHE = {}


def _device_idx(arr: np.ndarray, device=None):
    """Content-cached device copy of a host int index array."""
    import jax
    import jax.numpy as jnp

    # keyed on the raw bytes (index arrays are tiny): a 64-bit hash
    # collision would silently gather wrong rows into the kernel
    key = (arr.shape, arr.dtype.str, arr.tobytes(), device)
    hit = _IDX_CACHE.get(key)
    if hit is None:
        if len(_IDX_CACHE) > 4096:
            _IDX_CACHE.clear()
        hit = jnp.asarray(arr) if device is None else jax.device_put(arr, device)
        _IDX_CACHE[key] = hit
    return hit


# per-process counters of which selection path each async-mode site update
# took: "static" = plan-constrained, no device data at all; "stale" = one
# host sync against the previous visit's prefetched spectrum (includes
# periodic revalidations); "sync" = blocking fetch of the current spectrum
# (plan miss); "noarm" = a visit whose selection was not top-k-per-sector so
# the static path could not arm.  Read by bench.py's per-sweep phase profile.
PLAN_STATS = {"static": 0, "stale": 0, "sync": 0, "noarm": 0}


def reset_plan_stats():
    PLAN_STATS.clear()
    PLAN_STATS.update({"static": 0, "stale": 0, "sync": 0, "noarm": 0})


def async_enabled() -> bool:
    """Zero-sync steady-state sweeps: when a site's quantum-number pattern is
    unchanged since the previous sweep, select the retained basis from the
    PREVIOUS visit's candidate spectrum (fetched asynchronously in the
    meantime) so the site update issues no blocking transfer at all.  The
    per-sector split lags one sweep during convergence drift — variationally
    safe, exact at steady state.  ``RENO_ASYNC_TRUNC=1/0`` overrides the
    accelerator default."""
    import os

    flag = os.environ.get("RENO_ASYNC_TRUNC", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    import jax

    return jax.default_backend() != "cpu"


def static_revalidate_interval() -> int:
    """Every N consecutive plan-constrained static selections, re-derive the
    per-sector keep counts from the (async-fetched, one-sweep-stale) spectrum
    so that drifting sector weights cannot lock in an early cross-sector bond
    allocation forever (fixed-M TDVP evolution; DMRG armed pre-convergence).
    A revalidation visit costs one relay RTT; the default interval keeps that
    under ~5%% of steady-state sweep time.  ``RENO_STATIC_REVALIDATE=0``
    disables revalidation (counts frozen until the qn pattern changes)."""
    import os

    return int(os.environ.get("RENO_STATIC_REVALIDATE", "24"))


def batch_enabled() -> bool:
    """One-dispatch batched sector kernels (``RENO_TRUNC_BATCH``, default
    on): pad every sector of a site update to the update-wide bucket shape
    and vmap — one executable launch instead of one per sector.  Padding
    trades MXU-cheap FLOPs for launch count, which dominates on a
    relay-attached device; ``0`` restores the per-sector dispatch loop."""
    import os

    return os.environ.get("RENO_TRUNC_BATCH", "1") != "0"


def _orth_impl() -> str:
    """Orthogonalization kernel for the randomized range finder:
    ``RENO_TRUNC_ORTH=cholqr`` uses shifted CholeskyQR3 (pure matmul/chol/
    trsm — much faster than Householder QR on TPU), anything else XLA QR."""
    import os

    return os.environ.get("RENO_TRUNC_ORTH", "qr")


def sector_parallel_enabled() -> bool:
    """Distribute the independent per-sector candidate kernels round-robin
    over the global mesh's devices (SURVEY §2.6 axis (a): each sector is its
    own dispatch, trivially placeable).  ``RENO_SECTOR_PARALLEL=0`` forces
    single-device; default on whenever a multi-device global mesh is
    installed."""
    import os

    return os.environ.get("RENO_SECTOR_PARALLEL", "") != "0"


def verify_level() -> int:
    """Debug self-check level for device truncation (``RENO_TRUNC_VERIFY``):
    0 = off (default), 1 = orthonormality of the selected basis, 2 = also
    compare the selected spectrum against host LAPACK SVD.  Each check
    forces a device sync; for corruption hunts, not production."""
    import os

    return int(os.environ.get("RENO_TRUNC_VERIFY", "0"))


_VERIFY_DUMPS = 0


def verify_update(ms_mat, coef_array, sigma, sidx, m, n, system, label="",
                  replay=None):
    """RENO_TRUNC_VERIFY implementation: assert the renormalized basis is
    orthonormal (the invariant whose violation makes DMRG energies dip
    below the variational minimum) and optionally check the kept spectrum
    against host LAPACK.  On failure, dump everything needed to replay the
    site update offline and log loudly (the run continues)."""
    global _VERIFY_DUMPS
    import logging

    log = logging.getLogger(__name__)
    msh = np.asarray(ms_mat)
    g = msh.conj().T @ msh
    err = float(np.abs(g - np.eye(g.shape[1])).max())
    tol = 1e-3 if msh.itemsize <= 8 and msh.real.dtype.itemsize == 4 else 1e-8
    spec_err = 0.0
    if verify_level() >= 2:
        cm = np.asarray(coef_array).reshape(m, n)
        s_exact = np.linalg.svd(cm, compute_uv=False)
        kept = np.sort(np.asarray(sigma)[sidx])[::-1]
        k = len(kept)
        denom = max(s_exact[0], 1e-30)
        spec_err = float(np.abs(kept - s_exact[:k]).max() / denom)
    if err > tol or spec_err > 100 * tol:
        _VERIFY_DUMPS += 1
        path = f"/tmp/trunc_bad_{_VERIFY_DUMPS}.npz"
        if _VERIFY_DUMPS <= 8:
            extra = {}
            if replay is not None:
                qnbigl, qnbigr, qntot, cap = replay
                extra = dict(qnbigl=np.asarray(qnbigl),
                             qnbigr=np.asarray(qnbigr),
                             qntot=np.asarray(qntot), cap=cap)
            np.savez(path, coef=np.asarray(coef_array), ms=msh,
                     sigma=np.asarray(sigma), sidx=np.asarray(sidx),
                     m=m, n=n, system=system, label=str(label), **extra)
        log.error(
            "TRUNC VERIFY FAIL %s: orth_err=%.3e spec_err=%.3e dumped=%s",
            label, err, spec_err, path)
        return False
    return True


def candidates(coef_array, qnbigl, qnbigr, qntot, system: str, cap: int,
               want_complement: bool, fetch: bool = True,
               want_v: bool = False, return_layout: bool = False):
    """Compute truncation candidates on device.

    Returns ``(parts, sigma, qn_list)`` where ``parts`` is a list of device
    matrices (rows x l_s, sector-major, already scattered into the full row
    space of the kept side), ``sigma`` the host candidate singular values and
    ``qn_list`` the per-candidate quantum numbers.  With ``fetch=False`` the
    second element is instead the DEVICE array of candidate lambda = sigma^2
    (concatenated, sector-major) — nothing blocks.

    With a multi-device global mesh installed the sector kernels run
    round-robin across the mesh (results are copied back to the source
    device for the gather step) — bit-identical to the single-device path
    because each sector's kernel and PRNG key are unchanged.

    With ``return_layout=True`` a fourth element describes the candidate
    slot layout when a one-dispatch batched kernel produced them:
    ``(nsec_padded, l1p)`` — sector-major, ``l1p`` slots per sector, each
    sector's slots sorted by descending lambda — or ``None`` for the
    per-sector dispatch path (heterogeneous slot counts).
    """
    import jax
    import jax.numpy as jnp
    from renormalizer_tpu.mps.svd_qn import _sector_indices

    qntot = np.atleast_1d(np.asarray(qntot))
    qn_size = len(qntot)
    localqnl = np.asarray(qnbigl).reshape(-1, qn_size)
    localqnr = np.asarray(qnbigr).reshape(-1, qn_size)
    m, n = len(localqnl), len(localqnr)
    sectors = _sector_indices(localqnl, localqnr, qntot)
    if len(sectors) == 0:
        raise ValueError("Invalid quantum number")

    cmat = jnp.asarray(coef_array).reshape(m, n)
    transpose = system == "R"
    key_base = _device_key()

    sector_devs = None
    if len(sectors) > 1 and sector_parallel_enabled():
        from renormalizer_tpu.parallel.mesh import get_global_mesh

        mesh = get_global_mesh()
        if mesh is not None:
            devs = list(np.asarray(mesh.devices).flat)
            if len(devs) > 1:
                sector_devs = devs
    home = None
    cmat_by_dev = {}
    if sector_devs is not None:
        # results must land back wherever cmat lives: a single device, or —
        # when the caller runs under the mesh (sharded Davidson output) —
        # replicated over the mesh via cmat's own sharding
        cmat_devs = list(cmat.devices())
        home = cmat.sharding if len(cmat_devs) > 1 else cmat_devs[0]

    bq = bucket_quant()
    use_bucket = (not want_v) and (not want_complement) and bq > 1
    rdtype = np.dtype(str(cmat.dtype))
    mask_dtype = np.float64 if rdtype in (np.dtype(np.float64),
                                          np.dtype(np.complex128)) else np.float32

    eigh_impl_default = "xla"
    if not np.issubdtype(rdtype, np.complexfloating):
        from renormalizer_tpu.ops.jacobi import pallas_eigh_enabled

        if pallas_eigh_enabled():
            eigh_impl_default = "jacobi"

    def pick_eigh(l1p: int) -> str:
        """Eigensolver per sketch width.  XLA's QDWH eigh is fast at
        lane-aligned sizes and reports the structural zero block EXACTLY
        (deterministic slot validity); at unaligned sizes it is
        catastrophically slow (157 ms vs 7 ms at 256^2 measured on v5e), so
        the Pallas Jacobi kernel takes those."""
        if eigh_impl_default == "jacobi" and l1p % 128 != 0:
            return "jacobi"
        return "xla"

    def align_l1p(l1p: int) -> int:
        """Round the sketch width down to a 128-multiple when the loss fits
        inside the oversampling margin and selection can still fill ``cap``
        states per sector.  XLA's QR/QDWH-eigh on TPU are dramatically
        faster at lane-aligned sizes — the masked candidate kernel measures
        14.7 ms at l1p=256 vs 70 ms at l1p=264 (v5e, f32) — and the bottom
        OVERSAMPLE slots exist only as sketch-accuracy margin."""
        aligned = (l1p // 128) * 128
        if aligned >= cap and aligned >= l1p - OVERSAMPLE:
            return aligned
        return l1p

    # one-dispatch path: all sectors of the update in a single executable
    if use_bucket and sector_devs is None and batch_enabled():
        secs = []
        for nl, lset, rset in sectors:
            ml, nr = len(lset), len(rset)
            l1 = min(min(ml, nr), cap + OVERSAMPLE)
            if l1 > 0:
                secs.append((nl, lset, rset, ml, nr))
        # pad the sector axis to a multiple of 2: sector count drifts +-1
        # as qn splits shift between sweeps, and each count is its own
        # executable.  A pad slot is all-zero masks with l1_real=0, so
        # every candidate it reports is the -1 sentinel (unselectable)
        nsec_p = -(-len(secs) // 2) * 2
        if secs and nsec_p * m * n * rdtype.itemsize <= mask_budget():
            # mask-only kernel: shapes depend ONLY on site-fixed (m, n),
            # the padded sector count and the sketch width — the drifting
            # sector extents never reach the compiler
            l1p = align_l1p(min(min(m, n), cap + OVERSAMPLE))
            mask_r_b = np.zeros((nsec_p, m), dtype=mask_dtype)
            mask_c_b = np.zeros((nsec_p, n), dtype=mask_dtype)
            l1_b = np.zeros((nsec_p,), dtype=np.int32)
            qn_list = []
            for i in range(nsec_p):
                if i >= len(secs):  # pad slot
                    qn_list.extend([qn_list[-1]] * l1p)
                    continue
                nl, lset, rset, ml, nr = secs[i]
                mask_r_b[i, lset] = 1
                mask_c_b[i, rset] = 1
                l1_b[i] = min(min(ml, nr), l1p)
                label = (tuple(nl) if not transpose
                         else tuple(np.asarray(qntot) - nl))
                qn_list.extend([label] * l1p)
            run = _sector_factory_masked(m, n, nsec_p, l1p, transpose,
                                         str(cmat.dtype), pick_eigh(l1p),
                                         _orth_impl())
            out, lam_dev = run(cmat, _device_idx(mask_r_b),
                               _device_idx(mask_c_b), _device_idx(l1_b),
                               key_base)
            parts = [out]
            layout = (nsec_p, l1p)
            if not fetch:
                return ((parts, lam_dev, qn_list, layout) if return_layout
                        else (parts, lam_dev, qn_list))
            sig = lam_to_sigma(lam_dev)
            return ((parts, sig, qn_list, layout) if return_layout
                    else (parts, sig, qn_list))
        if len(secs) > 1:
            mlp = min(-(-max(s[3] for s in secs) // bq) * bq, m)
            nrp = min(-(-max(s[4] for s in secs) // bq) * bq, n)
            l1p = align_l1p(min(min(mlp, nrp), cap + OVERSAMPLE))
            # pad the sector axis to a multiple of 2: sector count drifts
            # +-1 as qn splits shift between sweeps, and each count is its
            # own executable.  A pad slot is all-zero masks with l1_real=0,
            # so every candidate it reports is the -1 sentinel (unselectable)
            nsec = -(-len(secs) // 2) * 2
            gr_b = np.zeros((nsec, mlp), dtype=np.int32)
            gc_b = np.zeros((nsec, nrp), dtype=np.int32)
            mask_r_b = np.zeros((nsec, mlp), dtype=mask_dtype)
            mask_c_b = np.zeros((nsec, nrp), dtype=mask_dtype)
            l1_b = np.zeros((nsec,), dtype=np.int32)
            qn_list = []
            for i in range(nsec):
                if i >= len(secs):  # pad slot: zero masks, l1_real = 0
                    qn_list.extend([qn_list[-1]] * l1p)
                    continue
                nl, lset, rset, ml, nr = secs[i]
                gr_b[i, :ml] = lset
                gc_b[i, :nr] = rset
                mask_r_b[i, :ml] = 1
                mask_c_b[i, :nr] = 1
                l1_b[i] = min(min(ml, nr), l1p)
                label = (tuple(nl) if not transpose
                         else tuple(np.asarray(qntot) - nl))
                qn_list.extend([label] * l1p)
            run = _sector_factory_batched(m, n, nsec, mlp, nrp, l1p,
                                          transpose, str(cmat.dtype),
                                          pick_eigh(l1p), _orth_impl())
            out, lam_dev = run(cmat, _device_idx(gr_b), _device_idx(gc_b),
                               _device_idx(mask_r_b), _device_idx(mask_c_b),
                               _device_idx(l1_b), key_base)
            parts = [out]
            layout = (nsec, l1p)
            if not fetch:
                return ((parts, lam_dev, qn_list, layout) if return_layout
                        else (parts, lam_dev, qn_list))
            sig = lam_to_sigma(lam_dev)
            return ((parts, sig, qn_list, layout) if return_layout
                    else (parts, sig, qn_list))

    parts = []
    parts_v = []
    lams = []
    qn_list: List[tuple] = []
    for isec, (nl, lset, rset) in enumerate(sectors):
        ml, nr = len(lset), len(rset)
        rank = min(ml, nr)
        l1 = min(rank, cap + OVERSAMPLE)
        rows = nr if transpose else ml
        l2 = min(max(rows - l1, 0), cap) if want_complement else 0
        if l1 + l2 == 0:
            continue
        dev = None
        cmat_s, key_s = cmat, key_base
        if sector_devs is not None:
            dev = sector_devs[isec % len(sector_devs)]
            cmat_s = cmat_by_dev.get(dev)
            if cmat_s is None:
                cmat_s = jax.device_put(cmat, dev)
                cmat_by_dev[dev] = cmat_s
            key_s = jax.device_put(key_base, dev)
        if use_bucket:
            mlp = min(-(-ml // bq) * bq, m)
            nrp = min(-(-nr // bq) * bq, n)
            l1p = min(min(mlp, nrp), cap + OVERSAMPLE)
            # route the eigensolver by the PADDED sketch width: the Gram
            # matrix inside the bucketed kernel is (l1p, l1p), so alignment
            # must be judged on l1p, not the unpadded l1 (an unaligned l1p
            # with QDWH is the measured 157ms-vs-7ms catastrophic case)
            eigh_impl = pick_eigh(l1p)
            gr = np.zeros(mlp, dtype=np.int32)
            gr[:ml] = lset
            gc = np.zeros(nrp, dtype=np.int32)
            gc[:nr] = rset
            mask_r = np.zeros(mlp, dtype=mask_dtype)
            mask_r[:ml] = 1
            mask_c = np.zeros(nrp, dtype=mask_dtype)
            mask_c[:nr] = 1
            run = _sector_factory_bucketed(m, n, mlp, nrp, l1p, transpose,
                                           str(cmat.dtype), eigh_impl,
                                           _orth_impl())
            out = run(cmat_s, _device_idx(gr, dev), _device_idx(gc, dev),
                      _device_idx(mask_r, dev), _device_idx(mask_c, dev),
                      _device_idx(np.int32(l1), dev), key_s)
            l1 = l1p  # qn labels cover every (incl. pad) candidate slot
        else:
            eigh_impl = pick_eigh(l1)
            run = _sector_factory(m, n, ml, nr, l1, l2, transpose,
                                  str(cmat.dtype), want_v, eigh_impl,
                                  _orth_impl())
            out = run(cmat_s, _device_idx(lset.astype(np.int32), dev),
                      _device_idx(rset.astype(np.int32), dev), key_s)
        if want_v:
            out, lam, out_v = out
        else:
            out, lam = out
        if dev is not None and home is not None:
            out = jax.device_put(out, home)
            lam = jax.device_put(lam, home)
            if want_v:
                out_v = jax.device_put(out_v, home)
        if want_v:
            parts_v.append(out_v)
        parts.append(out)
        lams.append(lam)
        label = tuple(nl) if not transpose else tuple(np.asarray(qntot) - nl)
        qn_list.extend([label] * (l1 + l2))

    lam_dev = jnp.concatenate(lams) if len(lams) > 1 else lams[0]
    if not fetch:
        ret = (parts, lam_dev, qn_list)
        if return_layout:
            ret = ret + (None,)
        return ret + (parts_v,) if want_v else ret
    # ONE small synchronous fetch: all candidate spectra at once
    sigma = lam_to_sigma(lam_dev)
    ret = (parts, sigma, qn_list)
    if return_layout:
        ret = ret + (None,)
    return ret + (parts_v,) if want_v else ret


@lru_cache(maxsize=None)
def _device_key():
    import jax

    return jax.random.PRNGKey(backend.seed)


@lru_cache(maxsize=None)
def _gather_pair_factory(nparts: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(sel, *parts):
        pa, pb = parts[:nparts], parts[nparts:]
        a = pa[0] if nparts == 1 else jnp.concatenate(pa, axis=1)
        b = pb[0] if nparts == 1 else jnp.concatenate(pb, axis=1)
        return a[:, sel], b[:, sel]

    return run


@lru_cache(maxsize=None)
def _apply_factory(nparts: int, transpose: bool, mn: tuple = None,
                   lshape: tuple = None, rshape: tuple = None):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(cmat, sel, *parts):
        cmat = cmat.reshape(mn)
        u = parts[0] if nparts == 1 else jnp.concatenate(parts, axis=1)
        ms = u[:, sel]
        if transpose:
            # to_left: ms columns are conj(V); comp = C conj(ms) = U S
            comp = cmat @ ms.conj()
        else:
            comp = ms.conj().T @ cmat  # = S V^H
        if lshape is None:
            return ms, comp
        # site/complement tensor reshapes (and the to_left axis move)
        # folded into the same dispatch: eagerly they cost 2 relay
        # dispatches per site update
        msdim = ms.shape[1]
        if transpose:
            site = jnp.moveaxis(ms.reshape(rshape + (msdim,)), -1, 0)
            compms = comp.reshape(lshape + (msdim,))
        else:
            site = ms.reshape(lshape + (msdim,))
            compms = comp.reshape((msdim,) + rshape)
        return site, compms

    return run


def apply_selection(coef_array, parts, sidx: np.ndarray, m: int, n: int,
                    system: str, lshape: tuple = None, rshape: tuple = None):
    """Gather the selected candidate columns and rotate the complement.

    With ``lshape``/``rshape`` (the qnbig free-leg shapes) the returned
    tensors come back fully reshaped for the chain — to_right
    ``(lshape + (M,), (M,) + rshape)``, to_left ``((M,) + rshape... moved,
    lshape + (M,))`` — in the same dispatch.  Without them (legacy), flat
    matrices: to_right ``ms`` is (m, M) and ``comp = ms^H C`` is (M, n);
    to_left ``ms`` is (n, M) (Vset convention, i.e. conj(V)) and
    ``comp = C conj(ms)`` is (m, M).
    """
    import jax.numpy as jnp

    from renormalizer_tpu.ops.contract import _harmonize_devices

    cmat = jnp.asarray(coef_array)
    run = _apply_factory(len(parts), system == "R", (m, n),
                         None if lshape is None else tuple(lshape),
                         None if rshape is None else tuple(rshape))
    sel = jnp.asarray(np.asarray(sidx, dtype=np.int32))
    args = _harmonize_devices([cmat, sel, *parts])
    return run(*args)
