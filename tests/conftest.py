"""Test configuration: run on a virtual 8-device CPU mesh with fp64.

Real-TPU behavior is exercised by bench.py / __graft_entry__.py; unit tests
target numerical parity with the reference, which requires fp64/complex128
(not available on TPU hardware).
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
    compiled executables and device buffers behind."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
