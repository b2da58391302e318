r"""Optional on-device tracing.

Set ``RENO_PROFILE=/path/to/dir`` to capture a JAX/XLA profiler trace
(viewable in TensorBoard / Perfetto) around the main compute drivers
(`optimize_mps`, `TdMpsJob.evolve`).  Zero overhead when unset.
"""

import contextlib
import logging
import os

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def maybe_profile(tag: str = ""):
    trace_dir = os.environ.get("RENO_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, tag) if tag else trace_dir
    logger.info(f"capturing device trace to {path}")
    try:
        with jax.profiler.trace(path):
            yield
    except Exception:  # pragma: no cover - profiling must never break compute
        logger.exception("profiler failed; continuing without trace")
        yield
