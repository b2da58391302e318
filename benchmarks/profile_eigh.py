#!/usr/bin/env python
"""Jacobi-vs-QDWH eigensolver benchmark at the truncation path's real shapes
(VERDICT r2 item 4).  Matrices use a DMRG-like exponentially decaying
spectrum — iteration counts of both solvers are conditioning-dependent.

Prints one line per size: XLA QDWH eigh ms, Pallas Jacobi ms, and the
Jacobi max |lam - lam_ref| / ||A|| accuracy check.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit_fetch(fn, arg, n=10):
    out = fn(arg)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from renormalizer_tpu.ops.jacobi import jacobi_eigh

    rng = np.random.default_rng(0)
    eigh_xla = jax.jit(jnp.linalg.eigh)
    jac = jax.jit(lambda g: jacobi_eigh(g))

    print(f"# backend={jax.default_backend()} device={jax.devices()[0]}")
    print("# n  qdwh_ms  jacobi_ms  jacobi_lam_err")
    for n in (128, 192, 256, 288, 384, 512):
        # graded spectrum over ~7 decades (typical truncation G = B B^H)
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = 10.0 ** np.linspace(0, -7, n)
        a = (q * lam) @ q.T
        a = ((a + a.T) / 2).astype(np.float32)
        ad = jnp.asarray(a)

        t_x = timeit_fetch(eigh_xla, ad)
        t_j = timeit_fetch(jac, ad)
        w_ref = np.linalg.eigvalsh(a.astype(np.float64))
        w_j = np.sort(np.asarray(jac(ad)[0]))
        err = float(np.abs(w_j - w_ref).max())
        print(f"{n:5d}  {t_x:8.3f}  {t_j:8.3f}  {err:.3e}")


if __name__ == "__main__":
    main()
