#!/usr/bin/env python
"""Measure on-device linalg primitive costs on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)


def timeit(f, *args, n=5):
    out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / n * 1e3


for n in (256, 512, 832, 1536):
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    g = a @ a.T
    print(f"n={n}")
    print(f"  eigh:     {timeit(jax.jit(jnp.linalg.eigh), g):8.1f} ms")
    print(f"  qr:       {timeit(jax.jit(partial(jnp.linalg.qr, mode='reduced')), a):8.1f} ms")
    if n <= 832:
        print(f"  svd:      {timeit(jax.jit(partial(jnp.linalg.svd, full_matrices=False)), a):8.1f} ms")

# batched small eigh (vmapped)
for b, n in ((2, 832), (4, 416), (8, 208), (16, 304)):
    g = jnp.asarray(rng.standard_normal((b, n, n)).astype(np.float32))
    g = jnp.einsum('bij,bkj->bik', g, g)
    f = jax.jit(jax.vmap(jnp.linalg.eigh))
    print(f"vmap eigh b={b} n={n}: {timeit(f, g):8.1f} ms")

# matmul reference: 1536^3 at different precisions
a = jnp.asarray(rng.standard_normal((1536, 1536)).astype(np.float32))
for prec in ("default", "highest"):
    f = jax.jit(partial(jnp.matmul, precision=prec))
    print(f"matmul 1536^3 {prec}: {timeit(f, a, a, n=20):8.2f} ms")

# qr of tall-skinny 1536x288
a2 = jnp.asarray(rng.standard_normal((1536, 288)).astype(np.float32))
print(f"qr 1536x288: {timeit(jax.jit(partial(jnp.linalg.qr, mode='reduced')), a2):8.1f} ms")
a3 = jnp.asarray(rng.standard_normal((1536, 512)).astype(np.float32))
print(f"qr 1536x512: {timeit(jax.jit(partial(jnp.linalg.qr, mode='reduced')), a3):8.1f} ms")

# top_k + gather
s = jnp.asarray(rng.standard_normal(1536).astype(np.float32))
f = jax.jit(lambda s, a: jnp.take(a, jax.lax.top_k(s, 256)[1], axis=1))
print(f"topk+gather 1536->256: {timeit(f, s, a):8.2f} ms")
