r"""Device mesh construction and the process-global mesh.

The mesh axes follow the bond-tensor-parallel DMRG layout (see package
docstring).  ``make_mesh`` validates against the available devices; tests
use a virtual CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""

import logging
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_GLOBAL_MESH = None


def make_mesh(data: int = 1, i: int = 1, j: int = 1, devices=None):
    """An ``(data, i, j)`` named mesh over the first ``data*i*j`` devices."""
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = data * i * j
    if len(devices) < n:
        raise RuntimeError(
            f"mesh (data={data}, i={i}, j={j}) needs {n} devices, "
            f"found {len(devices)}"
        )
    return Mesh(np.array(devices[:n]).reshape(data, i, j), ("data", "i", "j"))


def set_global_mesh(mesh) -> None:
    """Install ``mesh`` as the process-global mesh used by the sweep
    algorithms; pass ``None`` to disable sharding."""
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh
    if mesh is not None:
        logger.info(f"global mesh set: {dict(zip(mesh.axis_names, mesh.devices.shape))}")


def get_global_mesh() -> Optional["object"]:
    return _GLOBAL_MESH
