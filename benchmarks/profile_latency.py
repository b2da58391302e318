#!/usr/bin/env python
"""Measure tunnel round-trip latency + bandwidth + LAPACK cost in isolation."""
import time
import numpy as np
import jax
import jax.numpy as jnp

dev = jax.devices()[0]
print("device:", dev)

# round-trip latency: tiny transfer
x = jnp.zeros(8)
x.block_until_ready()
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        np.asarray(x[:4])
    print(f"tiny fetch roundtrip: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

# dispatch latency: trivial jitted op
f = jax.jit(lambda a: a + 1)
f(x).block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    f(x).block_until_ready()
print(f"jit dispatch+sync: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

# bandwidth: 9.4 MB fetch
big = jnp.ones((1536, 1536), dtype=jnp.float32)
big.block_until_ready()
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(big)
    dt = time.perf_counter() - t0
    print(f"9.4MB fetch: {dt*1e3:.0f} ms = {9.4/dt:.0f} MB/s")

# upload bandwidth
h = np.ones((1536, 1536), dtype=np.float32)
for _ in range(3):
    t0 = time.perf_counter()
    jnp.asarray(h).block_until_ready()
    dt = time.perf_counter() - t0
    print(f"9.4MB upload: {dt*1e3:.0f} ms = {9.4/dt:.0f} MB/s")

# host LAPACK: svd of 770x770 fp32 (typical sector block)
for n in (322, 770, 1536):
    a = np.random.default_rng(0).standard_normal((n, n)).astype(np.float32)
    t0 = time.perf_counter()
    np.linalg.svd(a, full_matrices=False)
    print(f"host sgesdd {n}x{n}: {(time.perf_counter()-t0)*1e3:.0f} ms")
    t0 = time.perf_counter()
    np.linalg.eigh(a @ a.T)
    print(f"host ssyevd {n}x{n} (+gram): {(time.perf_counter()-t0)*1e3:.0f} ms")

import os
print("cpus:", os.cpu_count())
