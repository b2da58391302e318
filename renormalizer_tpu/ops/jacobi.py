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
    total_rounds = sweeps * (n - 1)

    def kernel(a_ref, w_ref, v_ref, a_s, v_s):
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

        jax.lax.fori_loop(0, total_rounds, round_body, 0)
        a = a_s[:]
        w_ref[:] = jnp.sum(a * jnp.eye(n, dtype=a.dtype), axis=1)
        v_ref[:] = v_s[:]

    @jax.jit
    def run(a):
        dtype = a.dtype
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n,), dtype),
                jax.ShapeDtypeStruct((n, n), dtype),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
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


def jacobi_eigh(a, sweeps: int = None):
    """Eigendecomposition of a real symmetric matrix via the Pallas parallel
    Jacobi kernel; ascending eigenvalue order (like ``jnp.linalg.eigh``).

    Pads to an even lane-friendly size; zero padding is exact (identity
    rotations, eigenvalue 0) and is stripped before returning."""
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(a)
    n0 = a.shape[0]
    assert a.shape == (n0, n0)
    n = max(_round_up(n0, 16), 16)
    if sweeps is None:
        sweeps = 10 if jnp.finfo(a.dtype).bits == 32 else 14
    interpret = jax.default_backend() != "tpu"
    if n != n0:
        a = jnp.pad(a, ((0, n - n0), (0, n - n0)))
    run = _jacobi_factory(int(n), int(sweeps), bool(interpret))
    w, v = run(a)
    # restrict to the real block; padding rows/cols never mix (identity
    # rotations), so the top-left block of v is the true eigenbasis
    w_real = w[:n0]
    v_real = v[:n0, :n0]
    order = jnp.argsort(w_real)
    return w_real[order], v_real[:, order]
