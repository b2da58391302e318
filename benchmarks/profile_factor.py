#!/usr/bin/env python
"""Microbenchmark the factorization primitives the device-truncation kernel
can be built from, at the DMRG bench's real shapes (770x770 local matrix,
~10 sectors, sketch width l1<=288).

Times (per call, steady state, one device sync per batch):
  - jnp.linalg.qr        (tall-skinny, the current _orth)
  - jnp.linalg.eigh      (projected Gram, QDWH-based on TPU)
  - jnp.linalg.cholesky + triangular_solve (CholeskyQR building blocks)
  - pallas parallel-Jacobi eigh (ops/jacobi.py)
  - plain matmul roofline reference at the same shapes
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    dt = jnp.float32
    print("device:", jax.devices()[0])

    shapes_tall = [(770, 288), (512, 288), (256, 256), (770, 128)]
    shapes_sq = [96, 288, 512]

    for m, k in shapes_tall:
        a = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
        qr = jax.jit(lambda x: jnp.linalg.qr(x, mode="reduced")[0])
        print(f"qr({m}x{k}): {timeit(qr, a):.2f} ms")
        mm = jax.jit(lambda x: x.T @ x)
        print(f"syrk({m}x{k}): {timeit(mm, a):.3f} ms")

        def cholqr(x):
            g = x.T @ x
            tr = jnp.trace(g)
            eps = jnp.finfo(x.dtype).eps
            shift = 11.0 * eps * tr
            L = jnp.linalg.cholesky(g + shift * jnp.eye(g.shape[0], dtype=g.dtype))
            q = jax.lax.linalg.triangular_solve(
                L, x, left_side=False, lower=True, transpose_a=True)
            # second and third plain passes restore orthogonality
            for _ in range(2):
                g = q.T @ q
                L = jnp.linalg.cholesky(g)
                q = jax.lax.linalg.triangular_solve(
                    L, q, left_side=False, lower=True, transpose_a=True)
            return q
        cq = jax.jit(cholqr)
        t = timeit(cq, a)
        q = np.asarray(cq(a))
        orth_err = np.abs(q.T @ q - np.eye(k)).max()
        print(f"shifted-cholqr3({m}x{k}): {t:.2f} ms  (orth err {orth_err:.1e})")

    for n in shapes_sq:
        g0 = rng.standard_normal((n, n)).astype(np.float32)
        g = jnp.asarray(g0 @ g0.T + n * np.eye(n, dtype=np.float32))
        eigh = jax.jit(lambda x: jnp.linalg.eigh(x))
        print(f"eigh({n}x{n}): {timeit(eigh, g):.2f} ms")
        chol = jax.jit(jnp.linalg.cholesky)
        print(f"cholesky({n}x{n}): {timeit(chol, g):.2f} ms")
        try:
            from renormalizer_tpu.ops.jacobi import jacobi_eigh

            jac = jax.jit(jacobi_eigh)
            t = timeit(jac, g)
            lam, v = jac(g)
            lam_ref = np.linalg.eigvalsh(np.asarray(g))
            err = np.abs(np.sort(np.asarray(lam)) - lam_ref).max() / lam_ref.max()
            print(f"pallas_jacobi_eigh({n}x{n}): {t:.2f} ms (rel err {err:.1e})")
        except Exception as e:
            print(f"pallas_jacobi_eigh({n}x{n}): FAILED {type(e).__name__}: {e}")

    # full-sector-kernel composite estimate: sketch + power + orth + gram
    m, n, l1 = 770, 770, 288
    a = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    om = jnp.asarray(rng.standard_normal((n, l1)).astype(np.float32))

    @jax.jit
    def sketch_chain(a, om):
        y = a @ om
        y = a @ (a.T @ y)
        b = y.T @ a
        return b @ b.T

    print(f"matmul chain (770x770, l1=288): {timeit(sketch_chain, a, om):.2f} ms")


if __name__ == "__main__":
    main()
