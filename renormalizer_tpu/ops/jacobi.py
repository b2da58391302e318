r"""Pallas TPU kernel: symmetric eigensolver by parallel-ordered Jacobi.

XLA's ``jnp.linalg.eigh`` on TPU lowers to QDWH (measured ~9 ms at 512^2,
~70 ms at 1536^2) — far from the hardware's capability for the small/medium
Hermitian problems in the truncation path (the Rayleigh-Ritz step of
``mps/trunc_device.py``).  This kernel runs the classic parallel Jacobi
method instead: each round rotates n/2 DISJOINT row/column pairs at once
(pure VPU work, no sequential 2x2 sweeps), and the round-robin tournament
re-pairing is a static slice-and-concatenate permutation, so the whole
eigensolve is one fused kernel with no gathers and no host control flow.

The tournament ordering has period n-1, so after ``sweeps`` full cycles the
row/column ordering returns to the identity and the eigenpairs can be read
off directly.  Zero-padded rows/columns are harmless: their off-diagonal
entries stay exactly zero, every rotation touching them is the identity, and
they report eigenvalue 0.

Gate: ``RENO_PALLAS_EIGH`` (default ON for accelerator backends, OFF for
CPU).  Measured on v5e (f32, graded spectrum, fetch-synced): Jacobi 7.2 ms
vs QDWH 157 ms at 256^2 single, and 14 ms (lax.map) vs 134 ms (vmap) for a
4-batch — the decisive cost of the truncation path's Rayleigh-Ritz step.
Interpret mode is used automatically off-TPU so the kernel is fully
CPU-testable.
"""

from functools import lru_cache

import numpy as np


def pallas_eigh_enabled() -> bool:
    """Route the truncation path's Rayleigh-Ritz eigendecompositions
    through the Pallas Jacobi kernel.  ``RENO_PALLAS_EIGH=1/0`` forces;
    defaults to on for accelerator backends (where it is ~20x faster than
    QDWH, see module docstring) and off for CPU (interpret mode is
    correctness-grade, not speed-grade)."""
    import os

    flag = os.environ.get("RENO_PALLAS_EIGH", "")
    if flag in ("0", "1"):
        return flag == "1"
    import jax

    # only backends where the kernel runs natively: on anything else
    # (e.g. GPU) pallas would fall into interpret mode, which is
    # correctness-grade but far slower than the XLA eigh it replaces
    return jax.default_backend() in ("tpu", "axon")


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _vmem_budget_bytes() -> int:
    """Scoped-VMEM budget the Jacobi kernel may plan against.  The TPU
    hardware limit is 16 MiB of scoped vmem per kernel; default to 14 MiB
    to leave headroom for Mosaic's fused-expression temporaries.
    Override with ``RENO_PALLAS_EIGH_VMEM_MB``."""
    import os

    mb = os.environ.get("RENO_PALLAS_EIGH_VMEM_MB", "")
    try:
        return int(float(mb) * 2**20) if mb else 14 * 2**20
    except ValueError:
        return 14 * 2**20


def jacobi_vmem_bytes(n0: int, dtype) -> int:
    """Scoped-VMEM footprint estimate of :func:`jacobi_eigh` at matrix size
    ``n0``: inputs (4 quadrants = n^2) + outputs (eigvec halves = n^2 + small)
    + scratch (matrix quadrants = n^2), i.e. ~3 n^2 elements, measured to
    match Mosaic's reported stack allocation within ~1% (v5e)."""
    n = max(_round_up(int(n0), 16), 16)
    itemsize = np.dtype(dtype).itemsize
    return (3 * n * n + 8 * n) * itemsize


def jacobi_fits_vmem(n0: int, dtype) -> bool:
    """Whether the Pallas Jacobi kernel compiles at this size.  Above the
    scoped-VMEM budget Mosaic aborts the whole executable with a compile
    error (measured: n=1056 f32 needed 17.99 MiB against the 16 MiB limit
    before the scratch reduction), so callers must fall back to XLA's QDWH
    eigh — slower at unaligned sizes, but it always compiles."""
    return jacobi_vmem_bytes(n0, dtype) <= _vmem_budget_bytes()


@lru_cache(maxsize=None)
def _jacobi_factory(n: int, sweeps: int, interpret: bool):
    """Jitted pallas eigensolver for (n, n) symmetric float32/float64,
    n even.  Returns (eigenvalues (n,), eigenvectors (n, n) columns).

    Layout: the matrix lives in the kernel as four (m, m) quadrant scratch
    refs (m = n/2) and the eigenvector matrix as two (n, m) half refs.  The
    pairing for round r is always (row i, row m+i), i.e. (top, bottom), so
    every rotation is a full-quadrant elementwise op, and the tournament
    re-pairing is a shift-by-one ``roll`` plus two masked single-row (or
    single-column) fixups.  Nothing in the hot loop slices at an unaligned
    offset — the original slice-and-concatenate permutation made Mosaic
    materialize ~290 full-matrix stack temporaries (42 MB of scoped vmem at
    n=192, over the 16 MB limit; measured on v5e), while this formulation
    compiles to a constant handful."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // 2
    assert m >= 2
    # convergence: at least ``sweeps`` full cycles (the tournament ordering
    # returns to identity after each n-1 rounds), then keep sweeping while
    # the off-diagonal Frobenius norm is above the dtype floor, bounded by
    # +16 extra sweeps.  No host syncs: the check runs inside the kernel.
    max_sweeps = sweeps + 16

    def kernel(tl_ref, tr_ref, bl_ref, br_ref,
               w_ref, vl_s, vr_s, resid_ref,
               tl_s, tr_s, bl_s, br_s):
        # the eigenvector halves accumulate directly in the OUTPUT refs
        # (vl_s/vr_s): output VMEM is read-write inside the kernel, and
        # dropping the two (n, m) scratch twins cuts the scoped-vmem
        # footprint from ~4 n^2 to ~3 n^2 bytes — the difference between
        # compiling and a Mosaic stack OOM at n=1056 f32 (16 MiB limit)
        dtype = tl_ref.dtype
        tl_s[:] = tl_ref[:]
        tr_s[:] = tr_ref[:]
        bl_s[:] = bl_ref[:]
        br_s[:] = br_ref[:]
        ri_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        ci_m = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
        # v = I split into halves: vl[i, j] = (i == j), vr[i, j] = (i == j+m)
        vl_s[:] = (ri_n == ci_m).astype(dtype)
        vr_s[:] = (ri_n == ci_m + m).astype(dtype)

        eye_m = (jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
                 == jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)).astype(dtype)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col_idx = ci_m

        def permute_pair_rows(top, bot):
            # full-row permutation [0, m, 1..m-2 | m+1..n-1, m-1] expressed
            # on the (top, bot) halves:
            #   top' = [t0, b0, t1..t_{m-2}],  bot' = [b1..b_{m-1}, t_{m-1}]
            top_roll = pltpu.roll(top, 1, 0)      # [t_{m-1}, t0, .., t_{m-2}]
            t_last = top_roll[0:1]
            top_new = jnp.where(row_idx == 0, top[0:1],
                                jnp.where(row_idx == 1, bot[0:1], top_roll))
            bot_new = jnp.where(row_idx == m - 1, t_last,
                                pltpu.roll(bot, m - 1, 0))
            return top_new, bot_new

        def permute_pair_cols(left, right):
            left_roll = pltpu.roll(left, 1, 1)
            l_last = left_roll[:, 0:1]
            left_new = jnp.where(col_idx == 0, left[:, 0:1],
                                 jnp.where(col_idx == 1, right[:, 0:1],
                                           left_roll))
            right_new = jnp.where(col_idx == m - 1, l_last,
                                  pltpu.roll(right, m - 1, 1))
            return left_new, right_new

        def round_body(r, _):
            tl, tr = tl_s[:], tr_s[:]
            bl, br = bl_s[:], br_s[:]
            vl, vr = vl_s[:], vr_s[:]
            # pair i = (row i, row m+i); 2x2 blocks via masked row-sums
            app = jnp.sum(tl * eye_m, axis=1)
            aqq = jnp.sum(br * eye_m, axis=1)
            apq = jnp.sum(tr * eye_m, axis=1)
            # Rutishauser rotation: zero a_pq
            safe = jnp.abs(apq) > jnp.finfo(dtype).tiny
            theta = (aqq - app) / jnp.where(safe, 2 * apq, 1.0)
            sgn = jnp.where(theta >= 0, 1.0, -1.0).astype(theta.dtype)
            t = sgn / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            c = jnp.where(safe, c, 1.0)
            s = jnp.where(safe, s, 0.0)
            cr, sr = c[:, None], s[:, None]   # row-side factors
            cc, sc = c[None, :], s[None, :]   # column-side factors

            # rows: [p; q] <- [[c, -s], [s, c]]^T pairwise, per column half
            tl1 = cr * tl - sr * bl
            bl1 = sr * tl + cr * bl
            tr1 = cr * tr - sr * br
            br1 = sr * tr + cr * br
            # columns: [l, r] <- [l, r] [[c, s], [-s, c]] per row half
            tl2 = tl1 * cc - tr1 * sc
            tr2 = tl1 * sc + tr1 * cc
            bl2 = bl1 * cc - br1 * sc
            br2 = bl1 * sc + br1 * cc
            vl2 = vl * cc - vr * sc
            vr2 = vl * sc + vr * cc

            # tournament re-pairing (period n-1): columns then rows
            tl3, tr3 = permute_pair_cols(tl2, tr2)
            bl3, br3 = permute_pair_cols(bl2, br2)
            vl3, vr3 = permute_pair_cols(vl2, vr2)
            tl4, bl4 = permute_pair_rows(tl3, bl3)
            tr4, br4 = permute_pair_rows(tr3, br3)
            tl_s[:], tr_s[:] = tl4, tr4
            bl_s[:], br_s[:] = bl4, br4
            vl_s[:], vr_s[:] = vl3, vr3
            return 0

        def off_diag2():
            tl, tr = tl_s[:], tr_s[:]
            bl, br = bl_s[:], br_s[:]
            total = (jnp.sum(tl * tl) + jnp.sum(tr * tr)
                     + jnp.sum(bl * bl) + jnp.sum(br * br))
            diag = (jnp.sum((tl * eye_m) ** 2) + jnp.sum((br * eye_m) ** 2))
            return total - diag, diag

        off0, diag0 = off_diag2()
        tol2 = (jnp.finfo(dtype).eps ** 2) * (off0 + diag0)

        def sweep_body(carry):
            isweep, _ = carry
            jax.lax.fori_loop(0, n - 1, round_body, 0)
            off, _ = off_diag2()
            return isweep + 1, off

        def sweep_cond(carry):
            isweep, off = carry
            return (isweep < sweeps) | ((off > tol2) & (isweep < max_sweeps))

        _, off_final = jax.lax.while_loop(
            sweep_cond, sweep_body, (0, off0 + jnp.asarray(1.0, dtype))
        )
        # natural index order is [top rows | bottom rows]
        w_ref[0:1] = jnp.sum(tl_s[:] * eye_m, axis=1)[None]
        w_ref[1:2] = jnp.sum(br_s[:] * eye_m, axis=1)[None]
        # relative off-diagonal residual: callers can assert convergence
        resid_ref[:] = jnp.sqrt(off_final / (off0 + diag0 + tol2))[None]

    @jax.jit
    def run(a):
        dtype = a.dtype
        w2, vl, vr, resid = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((2, m), dtype),
                jax.ShapeDtypeStruct((n, m), dtype),
                jax.ShapeDtypeStruct((n, m), dtype),
                jax.ShapeDtypeStruct((1,), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((m, m), dtype),
                pltpu.VMEM((m, m), dtype),
                pltpu.VMEM((m, m), dtype),
                pltpu.VMEM((m, m), dtype),
            ],
            interpret=interpret,
        )(a[:m, :m], a[:m, m:], a[m:, :m], a[m:, m:])
        w = w2.reshape(-1)
        v = jnp.concatenate([vl, vr], axis=1)
        return w, v, resid

    return run


def jacobi_eigh(a, sweeps: int = None, return_resid: bool = False):
    """Eigendecomposition of a real symmetric matrix via the Pallas parallel
    Jacobi kernel; ascending eigenvalue order (like ``jnp.linalg.eigh``).

    Pads to an even lane-friendly size; zero padding is exact (identity
    rotations, eigenvalue 0) and is stripped before returning.  The kernel
    keeps sweeping (up to +16 extra cycles) until the off-diagonal Frobenius
    norm reaches the dtype floor; with ``return_resid`` the relative
    off-diagonal residual is returned too, so callers/tests can detect the
    pathological non-converged case instead of silently consuming
    less-converged eigenvectors."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(a)
    n0 = a.shape[0]
    assert a.shape == (n0, n0)
    n = max(_round_up(n0, 16), 16)
    if sweeps is None:
        sweeps = 10 if jnp.finfo(a.dtype).bits == 32 else 14
    # interpret off-TPU; the axon relay platform compiles pallas remotely
    interpret = jax.default_backend() not in ("tpu", "axon")
    if n != n0:
        a = jnp.pad(a, ((0, n - n0), (0, n - n0)))
    run = _jacobi_factory(int(n), int(sweeps), bool(interpret))
    w, v, resid = run(a)
    # restrict to the real block; padding rows/cols never mix (identity
    # rotations), so the top-left block of v is the true eigenbasis
    w_real = w[:n0]
    v_real = v[:n0, :n0]
    order = jnp.argsort(w_real)
    if return_resid:
        return w_real[order], v_real[:, order], resid[0]
    return w_real[order], v_real[:, order]
