#!/usr/bin/env python
"""Break the per-sector truncation kernel into its device ops and time each
at the DMRG bench's real mid-chain shapes with an ill-conditioned (DMRG-like
exponentially decaying) spectrum — QDWH/eigh iteration counts and QR costs
are conditioning-dependent, so well-conditioned microbenches mislead.

Timing is fetch-synced (one tiny host read per batch) because
block_until_ready alone under-reports on the tunneled device.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit_fetch(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    m = n = 768          # 2-site local matrix at M=256, d=3
    ml, nr = 500, 500    # big sector
    l1 = 288             # cap + oversample
    dt = np.float32

    # DMRG-like spectrum: exponential decay over ~6 decades (fp32 floor)
    u0, _ = np.linalg.qr(rng.standard_normal((ml, ml)).astype(np.float64))
    v0, _ = np.linalg.qr(rng.standard_normal((nr, nr)).astype(np.float64))
    s = 10.0 ** -np.linspace(0, 6, min(ml, nr))
    blk = ((u0[:, : len(s)] * s) @ v0[: len(s), :]).astype(dt)
    cmat_np = np.zeros((m, n), dtype=dt)
    rows = rng.permutation(m)[:ml]
    cols = rng.permutation(n)[:nr]
    cmat_np[np.ix_(rows, cols)] = blk
    cmat = jnp.asarray(cmat_np)
    gr = jnp.asarray(np.sort(rows).astype(np.int32))
    gc = jnp.asarray(np.sort(cols).astype(np.int32))
    key = jax.random.PRNGKey(0)

    gather = jax.jit(lambda c, r, co: c[r][:, co])
    print(f"gather (768^2 -> 500^2): {timeit_fetch(gather, cmat, gr, gc):.2f} ms", flush=True)
    block = gather(cmat, gr, gc)

    sketch = jax.jit(lambda a, k: a @ jax.random.normal(k, (a.shape[1], l1), dtype=jnp.float32))
    print(f"sketch (randn+matmul): {timeit_fetch(sketch, block, key):.2f} ms", flush=True)
    y = sketch(block, key)

    qr_orth = jax.jit(lambda z: jnp.linalg.qr(z, mode="reduced")[0])
    print(f"qr_orth(500x288) illcond: {timeit_fetch(qr_orth, y):.2f} ms", flush=True)

    from renormalizer_tpu.mps.trunc_device import _orth_cholqr
    cq = jax.jit(_orth_cholqr)
    print(f"cholqr3(500x288) illcond: {timeit_fetch(cq, y):.2f} ms", flush=True)

    power = jax.jit(lambda a, q: a @ (a.T @ q))
    print(f"power iter: {timeit_fetch(power, block, qr_orth(y)):.2f} ms", flush=True)

    q = qr_orth(power(block, qr_orth(y)))
    gram = jax.jit(lambda q, a: (lambda b: b @ b.T)(q.T @ a))
    print(f"project+gram: {timeit_fetch(gram, q, block):.2f} ms", flush=True)
    g = gram(q, block)

    eigh = jax.jit(jnp.linalg.eigh)
    print(f"eigh(288) illcond: {timeit_fetch(eigh, g):.2f} ms", flush=True)

    from renormalizer_tpu.ops.jacobi import jacobi_eigh
    jac = jax.jit(lambda x: jacobi_eigh(x))
    try:
        t = timeit_fetch(jac, g)
        lam, v = jac(g)
        lam_ref = np.linalg.eigvalsh(np.asarray(g).astype(np.float64))
        err = np.abs(np.sort(np.asarray(lam)) - lam_ref).max() / max(lam_ref.max(), 1e-30)
        print(f"pallas_jacobi(288) illcond: {t:.2f} ms (rel err {err:.1e})", flush=True)
    except Exception as e:
        print(f"pallas_jacobi FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

    scatter = jax.jit(lambda u, r: jnp.zeros((m, l1), dtype=u.dtype).at[r].set(u))
    uu = q @ eigh(g)[1][:, ::-1]
    print(f"rotate+scatter: {timeit_fetch(jax.jit(lambda q, w, r: jnp.zeros((m, l1), dtype=q.dtype).at[r].set(q @ w[:, ::-1])), q, eigh(g)[1], gr[:500]):.2f} ms", flush=True)

    # the full current per-sector kernel, end to end
    from renormalizer_tpu.mps import trunc_device as td
    run_qr = td._sector_factory(m, n, ml, nr, l1, 0, False, "float32", False, "xla", "qr")
    print(f"FULL sector kernel (xla qr/eigh): {timeit_fetch(run_qr, cmat, gr, gc, key):.2f} ms", flush=True)
    run_cq = td._sector_factory(m, n, ml, nr, l1, 0, False, "float32", False, "xla", "cholqr")
    print(f"FULL sector kernel (cholqr + xla eigh): {timeit_fetch(run_cq, cmat, gr, gc, key):.2f} ms", flush=True)
    run_cj = td._sector_factory(m, n, ml, nr, l1, 0, False, "float32", False, "jacobi", "cholqr")
    print(f"FULL sector kernel (cholqr + jacobi): {timeit_fetch(run_cj, cmat, gr, gc, key):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
