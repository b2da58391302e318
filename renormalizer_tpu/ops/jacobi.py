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

Gate: ``RENO_PALLAS_EIGH=1`` opts in (default off until benchmarked on real
hardware); interpret mode is used automatically off-TPU so the kernel is
fully CPU-testable.
"""

from functools import lru_cache

import numpy as np


def pallas_eigh_enabled() -> bool:
    import os

    return os.environ.get("RENO_PALLAS_EIGH", "0") == "1"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@lru_cache(maxsize=128)
def _jacobi_factory(n: int, sweeps: int, interpret: bool):
    """Jitted pallas eigensolver for (n, n) symmetric float32/float64,
    n even.  Returns (eigenvalues (n,), eigenvectors (n, n) columns)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m = n // 2
    # convergence: at least ``sweeps`` full cycles (the tournament ordering
    # returns to identity after each n-1 rounds), then keep sweeping while
    # the off-diagonal Frobenius norm is above the dtype floor, bounded by
    # +16 extra sweeps.  No host syncs: the check runs inside the kernel.
    max_sweeps = sweeps + 16

    def kernel(a_ref, w_ref, v_ref, resid_ref, a_s, v_s):
        a_s[:] = a_ref[:]
        v_s[:] = jnp.eye(n, dtype=a_ref.dtype)

        def permute_rows(x):
            # round-robin walk: position 0 fixed; everyone else shifts one
            # seat: new order = [0, m, 1..m-2 | m+1..n-1, m-1]
            return jnp.concatenate([
                x[0:1], x[m:m + 1], x[1:m - 1],
                x[m + 1:], x[m - 1:m],
            ], axis=0)

        def permute_cols(x):
            return jnp.concatenate([
                x[:, 0:1], x[:, m:m + 1], x[:, 1:m - 1],
                x[:, m + 1:], x[:, m - 1:m],
            ], axis=1)

        eye_m = jnp.eye(m, dtype=a_ref.dtype)

        def round_body(r, _):
            a = a_s[:]
            v = v_s[:]
            # pair i = (row i, row m+i); extract the 2x2 blocks via masked
            # row-sums (no gathers on TPU)
            app = jnp.sum(a[:m, :m] * eye_m, axis=1)
            aqq = jnp.sum(a[m:, m:] * eye_m, axis=1)
            apq = jnp.sum(a[:m, m:] * eye_m, axis=1)
            # Rutishauser rotation: zero a_pq
            safe = jnp.abs(apq) > jnp.finfo(a.dtype).tiny
            theta = (aqq - app) / jnp.where(safe, 2 * apq, 1.0)
            sgn = jnp.where(theta >= 0, 1.0, -1.0).astype(theta.dtype)
            t = sgn / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            c = jnp.where(safe, c, 1.0)
            s = jnp.where(safe, s, 0.0)

            # rows: [p; q] <- [[c, -s], [s, c]]^T applied pairwise
            top, bot = a[:m, :], a[m:, :]
            new_top = c[:, None] * top - s[:, None] * bot
            new_bot = s[:, None] * top + c[:, None] * bot
            a = jnp.concatenate([new_top, new_bot], axis=0)
            # columns
            left, right = a[:, :m], a[:, m:]
            a = jnp.concatenate(
                [c[None, :] * left - s[None, :] * right,
                 s[None, :] * left + c[None, :] * right], axis=1
            )
            vl, vr = v[:, :m], v[:, m:]
            v = jnp.concatenate(
                [c[None, :] * vl - s[None, :] * vr,
                 s[None, :] * vl + c[None, :] * vr], axis=1
            )
            # tournament re-pairing (static permutation, period n-1)
            a_s[:] = permute_rows(permute_cols(a))
            v_s[:] = permute_cols(v)
            return 0

        eye_n = jnp.eye(n, dtype=a_ref.dtype)
        off0 = jnp.sum((a_ref[:] * (1 - eye_n)) ** 2)
        diag0 = jnp.sum((a_ref[:] * eye_n) ** 2)
        tol2 = (jnp.finfo(a_ref.dtype).eps ** 2) * (off0 + diag0)

        def sweep_body(carry):
            isweep, _ = carry
            jax.lax.fori_loop(0, n - 1, round_body, 0)
            a = a_s[:]
            off = jnp.sum((a * (1 - eye_n)) ** 2)
            return isweep + 1, off

        def sweep_cond(carry):
            isweep, off = carry
            return (isweep < sweeps) | ((off > tol2) & (isweep < max_sweeps))

        _, off_final = jax.lax.while_loop(
            sweep_cond, sweep_body, (0, off0 + jnp.asarray(1.0, a_ref.dtype))
        )
        a = a_s[:]
        w_ref[:] = jnp.sum(a * eye_n, axis=1)
        v_ref[:] = v_s[:]
        # relative off-diagonal residual: callers can assert convergence
        resid_ref[:] = jnp.sqrt(off_final / (off0 + diag0 + tol2))[None]

    @jax.jit
    def run(a):
        dtype = a.dtype
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n,), dtype),
                jax.ShapeDtypeStruct((n, n), dtype),
                jax.ShapeDtypeStruct((1,), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((n, n), dtype),
                pltpu.VMEM((n, n), dtype),
            ],
            interpret=interpret,
        )(a)

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
