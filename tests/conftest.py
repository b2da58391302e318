"""Test configuration: run on a virtual 8-device CPU mesh with fp64.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py; unit tests
target numerical parity with the reference, which requires fp64/complex128
(not available on TPU hardware).

Known environment limitation: running the WHOLE suite with
RENO_DEVICE_TRUNC=1 forced (the accelerator code paths on the CPU backend)
roughly doubles the number of XLA:CPU compilations per process and can hit a
flaky segfault inside jaxlib's CPU compiler (`backend_compile_and_load`).
Every module passes with the flag individually, and the device paths have
dedicated per-module coverage (test_trunc_device.py and forced-flag tests),
so the default suite leaves the flag at its platform default.
"""

import os

os.environ.setdefault("RENO_PLATFORM", "cpu")
os.environ.setdefault("RENO_DTYPE", "fp64")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap memory growth across the suite: each module leaves hundreds of
    compiled executables and device buffers behind.  Our own lru_cache'd
    jit factories keep executables alive past jax.clear_caches(), so clear
    those too."""
    yield
    import gc

    import jax

    def _clear(module_name, *attrs):
        import importlib
        import sys

        mod = sys.modules.get(module_name)
        if mod is None:
            return
        for attr in attrs:
            fn = getattr(mod, attr, None)
            if hasattr(fn, "cache_clear"):
                fn.cache_clear()

    _clear("renormalizer_tpu.mps.trunc_device",
           "_sector_factory", "_qr_factory", "_apply_factory",
           "_gather_pair_factory")
    _clear("renormalizer_tpu.ops.contract", "_einsum_jit")
    _clear("renormalizer_tpu.ops.jacobi", "_jacobi_factory")
    _clear("renormalizer_tpu.lib.solvers", "_davidson_factory", "_expm_factory")
    _clear("renormalizer_tpu.lib.split_complex", "_expm_split_factory")
    jax.clear_caches()
    gc.collect()
