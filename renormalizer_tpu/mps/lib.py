r"""MPS sweep machinery: environments, renormalized-basis selection, batched
compressed sums.

TPU notes: environments are a dict of *device* arrays (the reference keeps
them on host, ``renormalizer/mps/lib.py:114-118`` — on a tunneled TPU that
would cost tens of ms per access, so everything stays in HBM).  Basis
selection works on host copies of the singular values (tiny) and produces
static index lists used for device gathers.
"""

import logging
import os
from collections import deque
from functools import reduce
from typing import Dict, List, Union

import jax.numpy as jnp
import numpy as np

from renormalizer_tpu.backend import backend
from renormalizer_tpu.ops.contract import contract_one_site, contract_one_site_multi_mpo

logger = logging.getLogger(__name__)


class Environ:
    """Cache of left/right environment tensors
    (reference ``renormalizer/mps/lib.py:12-118``).

    ``(domain, siteidx)`` keys map to the environment covering sites
    ``0..siteidx`` (L) or ``siteidx..N-1`` (R):

    S-     -S     mps conj
    O- or  -O     mpo  (or a list of stacked mpos)
    S-     -S     mps
    """

    def __init__(self, mps, mpo, domain=None, mps_conj=None):
        from renormalizer_tpu.mps import offload

        hot = offload.hot_window()
        # HBM<->host tiering (RENO_HOST_OFFLOAD=N): keep the N most recently
        # used environment entries in HBM, offload the rest to host RAM with
        # transparent (and prefetched) restore
        self._store: Dict = offload.TieredStore(hot) if hot else {}
        ndim = len(mpo) + 2 if isinstance(mpo, list) else 3
        self.sentinel = jnp.ones([1] * ndim, dtype=backend.real_dtype)
        self._build(mps, mpo, domain, mps_conj)

    def _build(self, mps, mpo, domain, mps_conj):
        assert domain in ("L", "R", None)
        if mps_conj is None:
            # bra = ket*: conjugation happens inside the jitted environment
            # update (contract_one_site), not by materializing a conjugated
            # MPS (N extra dispatches per Environ build)
            mps_conj = [None] * len(mps)
        if domain is None:
            self._build(mps, mpo, "L", mps_conj)
            self._build(mps, mpo, "R", mps_conj)
            return
        self.write("L", -1, self.sentinel)
        self.write("R", len(mps), self.sentinel)
        if domain == "L":
            indices = range(0, len(mps) - 1)
        else:
            indices = range(len(mps) - 1, 0, -1)
        tensor = self.sentinel
        for idx in indices:
            tensor = self._contract(tensor, mps, mpo, idx, domain, mps_conj[idx])
            self.write(domain, idx, tensor)

    @staticmethod
    def _contract(tensor, mps, mpo, idx, domain, ms_conj):
        if isinstance(mpo, list):
            return contract_one_site_multi_mpo(
                tensor, mps[idx], [mp[idx] for mp in mpo], domain, ms_conj=ms_conj
            )
        return contract_one_site(tensor, mps[idx], mpo[idx], domain, ms_conj=ms_conj)

    def GetLR(self, domain, siteidx, mps, mpo, itensor=None, method="Scratch", mps_conj=None):
        """Fetch/update the environment at ``siteidx``.

        ``method``: "Enviro" reads the cache, "System" extends the neighbor
        environment by one site (and caches it), "Scratch" recomputes from the
        boundary."""
        assert domain in ("L", "R") and method in ("Enviro", "System", "Scratch")
        if mps_conj is None:
            mps_conj = [None] * len(mps)
        if siteidx not in range(len(mps)):
            return self.sentinel
        if method == "Enviro":
            return self.read(domain, siteidx)
        if method == "Scratch":
            itensor = self.sentinel
            sites = range(siteidx + 1) if domain == "L" else range(len(mps) - 1, siteidx - 1, -1)
            for i in sites:
                itensor = self._contract(itensor, mps, mpo, i, domain, mps_conj[i])
            return itensor
        # System
        if itensor is None:
            offset = -1 if domain == "L" else 1
            itensor = self.read(domain, siteidx + offset)
        itensor = self._contract(
            itensor, mps, mpo, siteidx, domain, mps_conj[siteidx]
        )
        self.write(domain, siteidx, itensor)
        return itensor

    def write(self, domain, siteidx, tensor):
        self._store[(domain, siteidx)] = jnp.asarray(tensor)

    def read(self, domain, siteidx):
        tensor = self._store[(domain, siteidx)]
        if isinstance(self._store, dict):
            return tensor
        # warm the neighbors the sweep will touch next (async host->HBM copy)
        for nxt in (siteidx - 1, siteidx + 1):
            self._store.prefetch((domain, nxt))
        return tensor


# Quantization granularity for per-sector retained counts.  DMRG sweeps
# drift sector splits by a few states between sweeps; every distinct split is
# a fresh set of XLA shapes (expensive remote compiles on tunneled TPUs).
# Rounding each sector's count to a multiple of G collapses the shape set at
# a negligible accuracy cost.  Applied only for reasonably large Mmax, and
# only on accelerator backends — on CPU there is no remote-compile cost, so
# the default granularity is 1 and truncation matches the reference exactly
# (override with RENO_SECTOR_QUANT).
def _default_sector_quant():
    if "RENO_SECTOR_QUANT" in os.environ:
        return int(os.environ["RENO_SECTOR_QUANT"])
    return 8 if backend.is_accelerator else 1


SECTOR_QUANT = _default_sector_quant()


def select_indices(sset, qnlist, Mmax, percent=0) -> List[int]:
    """Pick the retained candidate indices by singular value and qn block
    (the index-selection half of :func:`select_basis`)."""
    sset = np.asarray(sset)
    qnlist = [tuple(qn) for qn in qnlist]
    # bucketed device kernels mark pad slots with the sentinel sigma = -1:
    # unselectable.  The cut must NOT catch roundoff-negative weights (the
    # averaged-density-matrix path feeds eigenvalues here, where eigenvalues
    # that are mathematically 0 come out as -1e-17 and must stay selectable
    # — filtering them collapsed thermal-state bond dimensions to 1).
    available = {i: (qnlist[i], sset[i]) for i in range(len(qnlist))
                 if sset[i] > -0.5}
    qnset = {qnlist[i] for i in available}

    def take_from_block(qn, n):
        block = [(i, s) for i, (q, s) in available.items() if q == qn]
        block.sort(key=lambda t: t[1], reverse=True)
        chosen = [i for i, _ in block[:n]]
        for i in chosen:
            del available[i]
        return chosen

    nbasis = min(len(available), Mmax)
    sidx: List[int] = []
    if percent != 0:
        per_block = int(nbasis * percent / len(qnset))
        for qn in qnset:
            sidx += take_from_block(qn, per_block)
    remaining = sorted(available.items(), key=lambda t: t[1][1], reverse=True)
    sidx += [i for i, _ in remaining[: nbasis - len(sidx)]]
    assert len(sidx) == len(set(sidx))

    # quantize per-sector counts to stabilize downstream tensor shapes
    G = SECTOR_QUANT
    if G > 1 and Mmax >= 8 * G and len(sidx) >= 4 * G:
        by_qn: Dict[tuple, List[int]] = {}
        for i in sidx:
            by_qn.setdefault(qnlist[i], []).append(i)
        new_sidx: List[int] = []
        for qn, idx_list in by_qn.items():
            n = len(idx_list)
            keep = (n // G) * G if n >= G else n
            idx_list.sort(key=lambda i: sset[i], reverse=True)
            new_sidx += idx_list[:keep]
        if new_sidx:
            sidx = new_sidx
    return sidx


def select_basis(vset, sset, qnlist, compset, Mmax, percent=0):
    """Renormalized-basis selection of J. Chem. Phys. 120, 3172 (2004)
    (reference ``mps/lib.py:253-322``).

    A ``percent`` fraction of the retained basis is distributed equally over
    quantum-number blocks (by descending singular value within each block) to
    avoid local minima; the rest is taken globally by singular value.

    ``vset``/``compset`` are device matrices with basis vectors as columns;
    ``sset`` (host) are the weights.  Returns
    ``(ms, mpsdim, mpsqn, compms)`` where ``compms`` columns are scaled by
    their singular values.
    """
    sset = np.asarray(sset)
    qnlist = [tuple(qn) for qn in qnlist]
    sidx = select_indices(sset, qnlist, Mmax, percent)
    mpsdim = len(sidx)
    idx = jnp.asarray(np.array(sidx, dtype=int))
    # host inputs stay on host: every device gather of a new (shape, count)
    # pair is a fresh remote compile, and callers like ``Mps.random`` are
    # pure-numpy anyway
    host = isinstance(vset, np.ndarray)
    if host:
        ms = vset[:, np.array(sidx, dtype=int)]
    else:
        ms = jnp.asarray(vset)[:, idx]
    mpsqn = np.array([qnlist[i] for i in sidx])
    if compset is not None:
        # columns beyond compset's width correspond to zero singular values
        scale = np.where(np.array(sidx) < compset.shape[1], sset[sidx], 0.0)
        safe_np = np.minimum(np.array(sidx), compset.shape[1] - 1)
        if isinstance(compset, np.ndarray):
            compms = compset[:, safe_np] * scale[None, :]
        else:
            compms = compset[:, jnp.asarray(safe_np)] * jnp.asarray(scale)[None, :]
    else:
        compms = None
    return ms, mpsdim, mpsqn, compms


def compressed_sum(mps_list, batchsize=5, temp_m_trunc=None):
    """Sum many MPS with intermediate compression in batches
    (reference ``mps/lib.py:417-439``)."""
    assert len(mps_list) != 0
    queue = deque(mps_list)
    if len(queue) == 1:
        new_mps = mps_list[0].canonicalise()
        new_mps.compress(temp_m_trunc=temp_m_trunc)
        return new_mps
    while len(queue) != 1:
        batch = [queue.popleft() for _ in range(min(batchsize, len(queue)))]
        summed = reduce(lambda a, b: a.add(b), batch)
        summed.canonicalise()
        summed.compress(temp_m_trunc=temp_m_trunc)
        queue.append(summed)
    return queue[0]


def cvec2cmat(c, qn_mask: np.ndarray, nroots=1):
    """Scatter a qn-masked flat vector back into the dense local tensor
    (reference ``mps/lib.py:442-457``).  Device scatter."""
    mask_idx = jnp.asarray(np.nonzero(qn_mask.ravel())[0])

    def one(vec):
        vec = jnp.asarray(vec)
        full = jnp.zeros(qn_mask.size, dtype=vec.dtype)
        return full.at[mask_idx].set(vec).reshape(qn_mask.shape)

    if nroots == 1:
        return one(c)
    if not isinstance(c, list):
        c = [c[:, i] for i in range(c.shape[1])]
    return [one(ci) for ci in c]
