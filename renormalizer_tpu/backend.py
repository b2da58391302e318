"""TPU-native array backend configuration.

Replaces the NumPy/CuPy ``xp`` shim of the reference
(``renormalizer/mps/backend.py:29-216``) with a JAX dtype/device policy.

Design notes (TPU-first):

* All site tensors, environments and iterative-solver state live on device as
  ``jax.Array``.  Host round-trips are reserved for tiny metadata (quantum
  number bookkeeping, singular values for truncation decisions) because on
  tunneled TPU setups a single host<->device copy costs tens of milliseconds.
* dtype policy: TPUs do not support complex128 (float64 is emulated).  The
  default is therefore float64/complex128 on CPU (numerical parity with the
  reference) and float32/complex64 on TPU (native speed).  Override with the
  ``RENO_DTYPE`` environment variable (``fp64`` or ``fp32``).
"""

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def _apply_platform_override():
    """Honor ``RENO_PLATFORM`` even when a site hook (e.g. the axon TPU
    relay) has pinned ``jax_platforms`` programmatically."""
    platform = os.environ.get("RENO_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_apply_platform_override()


def _decide_dtype_bits() -> int:
    env = os.environ.get("RENO_DTYPE", "").lower()
    if env in ("fp64", "64", "float64"):
        return 64
    if env in ("fp32", "32", "float32"):
        return 32
    # decide by platform: CPU -> fp64, TPU/GPU -> fp32
    import jax

    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - no device at all
        platform = "cpu"
    return 64 if platform == "cpu" else 32


def _setup_compilation_cache():
    """Persistent XLA compilation cache: DMRG sweeps trace many distinct
    shapes; caching them across processes removes most compile latency."""
    import jax

    cache_dir = os.environ.get(
        "RENO_COMPILE_CACHE", os.path.expanduser("~/.cache/renormalizer_tpu_xla")
    )
    # CPU AOT cache entries are machine-feature sensitive and can SIGILL
    # when reloaded; only cache for accelerator backends.  Device plugins
    # behind network tunnels can be transiently unavailable at import time;
    # retry once before giving up on the cache (compute retries later).
    try:
        default = jax.default_backend()
    except RuntimeError:
        import time

        time.sleep(5)
        try:
            default = jax.default_backend()
        except RuntimeError:
            return
    if default == "cpu":
        return
    if cache_dir and cache_dir.lower() != "off":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        except Exception:  # pragma: no cover - older jax
            pass


class Backend:
    """Singleton holding the dtype policy and PRNG state."""

    def __init__(self):
        import jax

        self._bits = _decide_dtype_bits()
        if self._bits == 64:
            jax.config.update("jax_enable_x64", True)
        # TPU matmuls on f32 inputs default to bfloat16 passes, which is far
        # too coarse for DMRG energies (the Rayleigh quotient picks up ~1e-3
        # relative error).  Demand true f32 unless explicitly overridden.
        matmul_prec = os.environ.get("RENO_MATMUL_PREC", "float32")
        try:
            jax.config.update("jax_default_matmul_precision", matmul_prec)
        except Exception:  # pragma: no cover - unknown setting
            pass
        # numerical sanitizer tier (reference analog: strict numpy errstate,
        # ``utils/log.py:46-48``): RENO_DEBUG_NANS=1 makes jax re-run the
        # offending primitive eagerly and raise on the first NaN/Inf, and
        # numpy raise instead of warn.  Debug tool - slows everything down.
        if os.environ.get("RENO_DEBUG_NANS", "0") == "1":
            jax.config.update("jax_debug_nans", True)
            np.seterr(divide="raise", over="raise", invalid="raise")
        _setup_compilation_cache()
        self.jax = jax
        self._seed = 2019
        self.canonical_atol = 1e-3 if self._bits == 32 else 1e-5
        self.canonical_rtol = 1e-2 if self._bits == 32 else 1e-5
        logger.info(
            "renormalizer_tpu backend: platform=%s precision=fp%d",
            jax.default_backend(), self._bits,
        )

    @property
    def is_32bits(self) -> bool:
        return self._bits == 32

    @property
    def is_accelerator(self) -> bool:
        """True when running on TPU/GPU (vs host CPU)."""
        return self.jax.default_backend() != "cpu"

    @property
    def real_dtype(self):
        return np.float32 if self._bits == 32 else np.float64

    @property
    def complex_dtype(self):
        return np.complex64 if self._bits == 32 else np.complex128

    def use_32bits(self):
        self._bits = 32

    def use_64bits(self):
        self.jax.config.update("jax_enable_x64", True)
        self._bits = 64

    @property
    def seed(self):
        return self._seed

    def sync(self):
        """Block until all dispatched device work completes (for timing)."""
        import jax

        jax.effects_barrier()


def _install_complex_fetch_shim():
    """Route every complex device->host fetch through an on-device
    real/imag split plus two REAL transfers.

    Measured relay behavior (round-4 probes): complex *compute* on the
    tunneled TPU works (einsum/QR/eigh/SVD all pass) but any complex
    H2D/D2H *transfer* raises UNIMPLEMENTED — and because transfers are
    async, one poisoned buffer fails every later dispatch that touches it.
    All host materialization (``np.asarray``, ``complex()``, ``.item()``,
    printing) funnels through ``ArrayImpl._value``, so patching that one
    property makes every fetch path safe without auditing each call site.
    The upload twin lives in ``ops.contract.safe_asarray``."""
    import jax
    from jax._src import array as jarray

    if getattr(jarray, "_reno_complex_fetch_shim", False):
        return
    prop = jarray.ArrayImpl.__dict__.get("_value")
    if prop is None or prop.fget is None:  # pragma: no cover - jax internals moved
        logger.warning("complex fetch shim: ArrayImpl._value not found")
        return
    orig_fget = prop.fget

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def split_fetch(shape, dtype_name):
        import jax.numpy as jnp

        @jax.jit
        def run(x):
            return jnp.real(x), jnp.imag(x)

        return run

    def fget(self):
        if (self._npy_value is None
                and np.issubdtype(self.dtype, np.complexfloating)):
            try:
                re, im = split_fetch(self.shape, str(self.dtype))(self)
                # np.asarray() around the sum: a 0-d result degrades to a
                # numpy scalar, which has no writeable flag
                val = np.asarray(np.asarray(re) + 1j * np.asarray(im))
                val.flags.writeable = False
                try:
                    self._npy_value = val
                except Exception:  # C++ ArrayImpl may reject the cache slot
                    pass
                return val
            except Exception as e:  # pragma: no cover - native-path fallback
                logger.warning("complex fetch shim failed (%s: %s); native "
                               "transfer will likely fail too",
                               type(e).__name__, e)
        return orig_fget(self)

    jarray.ArrayImpl._value = property(fget)
    jarray._reno_complex_fetch_shim = True


backend = Backend()

OE_BACKEND = "jax"
USE_TPU = backend.jax.default_backend() == "tpu"

if backend.is_accelerator:
    _install_complex_fetch_shim()
