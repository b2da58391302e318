#!/usr/bin/env python
"""Micro-profile the mask-only batched candidate kernel at the headline
bench's steady-state shapes: total dispatch+execute time per site update,
plus a stage-by-stage decomposition (sketch, orth, power, refine, eigh)
timed as separate jitted calls on the same operands.

Usage: PYTHONPATH=. python benchmarks/profile_masked_kernel.py [m n nsec l1p]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from renormalizer_tpu.mps import trunc_device as td

m, n, nsec, l1p = (int(x) for x in (sys.argv[1:5] or [1792, 1536, 4, 264]))
dtype = jnp.float32

rng = np.random.default_rng(0)
cmat = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
mask_r = np.zeros((nsec, m), np.float32)
mask_c = np.zeros((nsec, n), np.float32)
secl = np.array_split(np.arange(m), nsec)
secr = np.array_split(np.arange(n), nsec)
for i in range(nsec):
    mask_r[i, secl[i]] = 1
    mask_c[i, secr[i]] = 1
l1_real = np.full((nsec,), l1p, np.int32)
key = jax.random.PRNGKey(0)


def fetch1(out):
    # block_until_ready does not truly sync over the axon relay; fetching
    # one element does
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, niter=10):
    out = fn(*args)
    fetch1(out)
    t0 = time.perf_counter()
    for _ in range(niter):
        out = fn(*args)
        fetch1(out)
    return (time.perf_counter() - t0) / niter * 1e3


def report(tag, ms):
    print(f"{tag:40s} {ms:9.2f} ms")


# full kernel, qr orth
for orth_impl in ("qr", "cholqr"):
    for eigh_impl in ("xla", "jacobi"):
        td._sector_factory_masked.cache_clear()
        run = td._sector_factory_masked(m, n, nsec, l1p, False, "float32",
                                        eigh_impl, orth_impl)
        try:
            ms = timeit(run, cmat, jnp.asarray(mask_r), jnp.asarray(mask_c),
                        jnp.asarray(l1_real), key)
            report(f"masked full orth={orth_impl} eigh={eigh_impl}", ms)
        except Exception as e:
            report(f"masked full orth={orth_impl} eigh={eigh_impl}",
                   float("nan"))
            print("   error:", str(e)[:120])

# stage decomposition (single sector, not vmapped, orth=qr)
a = cmat * (jnp.asarray(mask_r)[0][:, None] * jnp.asarray(mask_c)[0][None, :])
omega = jax.random.normal(key, (n, l1p), dtype=dtype)

sk = jax.jit(lambda a, o: a @ o)
report("stage sketch a@omega", timeit(sk, a, omega))
y0 = sk(a, omega)
orth_qr = jax.jit(lambda z: jnp.linalg.qr(z, mode="reduced")[0])
report("stage orth qr (m,l1p)", timeit(orth_qr, y0))
yq = orth_qr(y0)
pw = jax.jit(lambda a, y: a @ (a.T @ y))
report("stage power a(aT y)", timeit(pw, a, yq))


def cholqr1(z):
    g = z.T @ z
    tr = jnp.trace(g)
    L = jnp.linalg.cholesky(g + (16 * jnp.finfo(z.dtype).eps * tr) * jnp.eye(z.shape[1], dtype=z.dtype))
    return jax.lax.linalg.triangular_solve(L, z, left_side=False, lower=True,
                                           transpose_a=True, conjugate_a=True)


report("stage cholqr 1 pass", timeit(jax.jit(cholqr1), y0))
g264 = jnp.asarray(rng.standard_normal((l1p, l1p)).astype(np.float32))
g264 = g264 @ g264.T
report("stage eigh xla (l1p)", timeit(jax.jit(jnp.linalg.eigh), g264))
vge = jax.jit(jax.vmap(jnp.linalg.eigh))
gb = jnp.broadcast_to(g264, (nsec, l1p, l1p))
report("stage eigh xla vmapped nsec", timeit(vge, gb))
try:
    from renormalizer_tpu.ops.jacobi import jacobi_eigh
    report("stage eigh jacobi (l1p)",
           timeit(jax.jit(lambda g: jacobi_eigh(g)[:2]), g264))
except Exception as e:
    print("jacobi error:", str(e)[:200])
vqr = jax.jit(jax.vmap(lambda z: jnp.linalg.qr(z, mode="reduced")[0]))
yb = jnp.broadcast_to(y0, (nsec,) + y0.shape)
report("stage orth qr vmapped nsec", timeit(vqr, yb))
