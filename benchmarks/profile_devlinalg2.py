#!/usr/bin/env python
"""Re-measure with result fetch to force completion, distinct inputs."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)


def timeit(f, make_arg, n=5):
    args = [make_arg(i) for i in range(n + 1)]
    _ = float(np.asarray(f(args[0])).ravel()[0])  # warm compile
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(1, n + 1):
        acc += float(np.asarray(f(args[i])).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    return dt


def mk_sym(n):
    def make(i):
        a = rng.standard_normal((n, n)).astype(np.float32)
        return jnp.asarray(a @ a.T)
    return make


def mk(n, m=None):
    m = m or n
    def make(i):
        return jnp.asarray(rng.standard_normal((n, m)).astype(np.float32))
    return make


eigh_w = jax.jit(lambda g: jnp.linalg.eigh(g)[1].sum(axis=0))
svd_s = jax.jit(lambda a: jnp.linalg.svd(a, full_matrices=False)[0].sum(axis=0))
qr_q = jax.jit(lambda a: jnp.linalg.qr(a, mode='reduced')[0].sum(axis=0))

for n in (256, 512, 832, 1536):
    print(f"n={n} eigh: {timeit(eigh_w, mk_sym(n)):8.1f} ms   qr: {timeit(qr_q, mk(n)):8.1f} ms   svd: {timeit(svd_s, mk(n)):8.1f} ms")

b_eigh = jax.jit(lambda g: jax.vmap(jnp.linalg.eigh)(g)[1].sum(axis=(0, 1)))
for b, n in ((2, 832), (4, 416)):
    def mkb(i, b=b, n=n):
        a = rng.standard_normal((b, n, n)).astype(np.float32)
        return jnp.asarray(np.einsum('bij,bkj->bik', a, a))
    print(f"vmap eigh b={b} n={n}: {timeit(b_eigh, mkb):8.1f} ms")

print(f"qr 1536x512: {timeit(qr_q, mk(1536, 512)):8.1f} ms")
mm = jax.jit(lambda a: (a @ a).sum(axis=0))
print(f"matmul 1536^3: {timeit(mm, mk(1536), n=10):8.2f} ms")
