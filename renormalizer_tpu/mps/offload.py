r"""HBM <-> host-RAM memory tiering.

The reference offloads big site tensors to DISK (``renormalizer/mps/
mp.py:1047-1080``) and keeps environments on host (``mps/lib.py:114-118``).
On TPU the right two tiers are HBM (~16 GB) and host RAM: cold environment
entries and off-center site tensors move to the host asynchronously and are
prefetched back one site ahead of the sweep, so large-M / long-chain runs are
bounded by host RAM instead of HBM while the sweep hot path stays in HBM.

Enable with ``RENO_HOST_OFFLOAD=N`` (keep the N most recently used
environment entries in HBM; 0 = disabled, the default).  Site-tensor
offload additionally respects ``CompressConfig.dump_matrix_size`` (bytes; the
reference's knob for "big enough to dump").
"""

import logging
import os
from collections import OrderedDict
from functools import lru_cache

logger = logging.getLogger(__name__)


@lru_cache(maxsize=1)
def hot_window() -> int:
    """0 disables tiering; N keeps the N most recently used entries in HBM."""
    return int(os.environ.get("RENO_HOST_OFFLOAD", "0"))


@lru_cache(maxsize=1)
def _host_device():
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:  # pragma: no cover - no CPU platform registered
        return None


def on_host(x) -> bool:
    try:
        return next(iter(x.devices())).platform == "cpu"
    except AttributeError:  # plain numpy
        return True


def to_host(x):
    """Asynchronously move an array to host RAM (keeps it a jax array so the
    round trip stays async and dtype-exact)."""
    import jax

    dev = _host_device()
    if dev is None:
        return x
    return jax.device_put(x, dev)


def to_device(x):
    import jax

    return jax.device_put(x, jax.local_devices()[0])


class TieredStore:
    """Mapping of key -> array with LRU host offload of cold entries.

    Reads restore (and re-warm) entries transparently; ``prefetch`` starts
    the host->HBM copy of an upcoming key without blocking."""

    def __init__(self, hot: int):
        assert hot > 0
        self.hot = hot
        self._data = OrderedDict()
        self._cold = set()  # keys currently living on the host tier
        self.n_evicted = 0
        self.n_restored = 0

    def __setitem__(self, key, value):
        self._data[key] = value
        self._cold.discard(key)
        self._data.move_to_end(key)
        self._evict()

    def __getitem__(self, key):
        v = self._data[key]
        if key in self._cold:
            v = to_device(v)
            self._data[key] = v
            self._cold.discard(key)
            self.n_restored += 1
        self._data.move_to_end(key)
        return v

    def __contains__(self, key):
        return key in self._data

    def prefetch(self, key):
        if key in self._cold:
            # device_put is asynchronous: the copy overlaps the current
            # device work and the next __getitem__ finds it resident
            self._data[key] = to_device(self._data[key])
            self._cold.discard(key)
            self.n_restored += 1

    def _evict(self):
        if len(self._data) <= self.hot:
            return
        ncold = len(self._data) - self.hot
        for key in list(self._data.keys())[:ncold]:
            if key not in self._cold:
                self._data[key] = to_host(self._data[key])
                self._cold.add(key)
                self.n_evicted += 1
