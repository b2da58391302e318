r"""MatrixProduct: the shared container for MPS / MPO / MpDm.

Site tensors are device arrays (``jax.Array``); quantum-number bookkeeping
(``qn`` per bond with shape (dim, qn_size), the moving ``qnidx`` boundary,
``qntot`` and sweep direction ``to_right``) is host NumPy since it only
determines shapes and masks.

Mirrors the reference ``renormalizer/mps/mp.py:34-1227``; deliberate
differences:

* no ``Matrix`` wrapper — plain device arrays + helper functions;
* the reference's disk offload (``mp.py:1047-1080``) is replaced by
  HBM<->host-RAM tiering (``offload.py``, RENO_HOST_OFFLOAD);
* sweep decompositions run on device (``trunc_device.py`` randomized
  sector-pure truncation + blockwise QR; host LAPACK ``svd_qn.py`` is the
  CPU/fallback path), so site tensors never leave HBM on the hot path.
"""

import logging
import os
from typing import List, Union

import jax.numpy as jnp
import numpy as np

from renormalizer_tpu.backend import backend
from renormalizer_tpu.model import Model
from renormalizer_tpu.mps import svd_qn, trunc_device
from renormalizer_tpu.mps.svd_qn import add_outer, get_qn_mask
from renormalizer_tpu.mps.lib import Environ, select_basis
from renormalizer_tpu.ops.contract import hop_expr, safe_asarray, tensordot1
from renormalizer_tpu.utils import (
    CompressConfig,
    CompressCriteria,
    OFS,
    calc_vn_entropy,
    sizeof_fmt,
)

logger = logging.getLogger(__name__)


def _content_digest(array):
    """128-bit content digest of a host array (None for device arrays —
    hashing those would force a device->host transfer)."""
    if not isinstance(array, np.ndarray):
        return None
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(str((array.shape, array.dtype.str)).encode())
    h.update(np.ascontiguousarray(array).tobytes())
    return h.digest()


def check_orthogonal(ms, left: bool, rtol=None, atol=None) -> bool:
    """Check left/right orthogonality of a site tensor."""
    rtol = rtol if rtol is not None else backend.canonical_rtol
    atol = atol if atol is not None else backend.canonical_atol
    arr = jnp.asarray(ms)
    if left:
        mat = arr.reshape(-1, arr.shape[-1])
        gram = mat.conj().T @ mat
    else:
        mat = arr.reshape(arr.shape[0], -1)
        gram = mat @ mat.conj().T
    eye = jnp.eye(gram.shape[0], dtype=gram.dtype)
    return bool(np.allclose(np.asarray(gram), np.asarray(eye), rtol=rtol, atol=atol))


class MatrixProduct:
    def __init__(self):
        # NOTE: update `metacopy` when adding attributes
        self._mp: List = []
        # host-side content digests of the site tensors (computed from the
        # numpy array before upload; None when a site was written from a
        # device array).  Used by ``Mps.expectations`` to share environments
        # across independently-built identical MPOs (reference
        # ``mps.py:2103-2169`` hashes with collision detection; a 128-bit
        # blake2b digest makes collisions practically impossible)
        self._mt_hashes: List = []
        # indices of site tensors currently offloaded to host RAM
        # (RENO_HOST_OFFLOAD tiering; reference disk offload ``mp.py:1047-1080``)
        self._cold_sites: set = set()
        # async-truncation plans: (cidx, direction) -> (qn-pattern digest,
        # device candidate spectrum of the previous visit)
        self._trunc_plans: dict = {}
        self.dtype = backend.real_dtype
        self.model: Model = None
        self.compress_config: CompressConfig = CompressConfig()
        # quantum number bookkeeping (host metadata)
        self.qn: List[np.ndarray] = []
        self.qnidx: int = None
        self.qntot: np.ndarray = None
        self.to_right: bool = None

    # --- IO ----------------------------------------------------------------
    @classmethod
    def load(cls, model: Model, fname: str):
        """Load an npz dump.  Accepts every reference protocol version
        0.1-0.4 (``renormalizer/mps/mps.py:366-385``) so reference-produced
        files work directly as oracles: newer dumps carry per-bond
        ``subqn_{i}`` arrays, older ones only the object-array ``qn``; v0.1
        stored the sweep direction under ``left``."""
        npload = np.load(fname, allow_pickle=True)
        mp = cls()
        mp.model = model
        nsites = int(npload["nsites"])
        for i in range(nsites):
            mt = npload[f"mt_{i}"]
            mp.dtype = backend.complex_dtype if np.iscomplexobj(mt) else backend.real_dtype
            mp.append(mt)
        if "subqn_0" in npload:
            mp.qn = [
                np.asarray(npload[f"subqn_{i}"]).astype(int).reshape(
                    len(npload[f"subqn_{i}"]), -1)
                for i in range(nsites + 1)
            ]
        else:
            mp.qn = [np.atleast_2d(np.asarray(q).astype(int)).reshape(-1, np.atleast_1d(npload["qntot"]).size)
                     for q in npload["qn"]]
        mp.qnidx = int(npload["qnidx"])
        mp.qntot = np.atleast_1d(npload["qntot"].astype(int))
        version = str(npload["version"]) if "version" in npload else "0.4"
        if version == "0.1":
            mp.to_right = bool(npload["left"])
        else:
            mp.to_right = bool(npload["to_right"])
        return mp

    def dump(self, fname, other_attrs=None):
        """npz dump, protocol "0.4" compatible with the reference
        (``mp.py:1085-1113``)."""
        if other_attrs is None:
            other_attrs = []
        elif isinstance(other_attrs, str):
            other_attrs = [other_attrs]
        data = {"version": "0.4", "nsites": self.site_num}
        for i, mt in enumerate(self):
            data[f"mt_{i}"] = np.asarray(mt)
        for attr in ["qnidx", "qntot", "to_right"] + other_attrs:
            data[attr] = getattr(self, attr)
        arr = np.empty(len(self.qn), object)
        arr[:] = [np.asarray(q) for q in self.qn]
        data["qn"] = arr
        for i, q in enumerate(self.qn):
            data[f"subqn_{i}"] = np.asarray(q)
        try:
            np.savez(fname, **data)
        except Exception:
            logger.exception("Dump MP failed.")

    @classmethod
    def from_mp(cls, model, mplist):
        mp = cls()
        mp.model = model
        for mt in mplist:
            if np.iscomplexobj(mt):
                mp.dtype = backend.complex_dtype
                break
        for mt in mplist:
            mp.append(mt)
        mp.build_empty_qn()
        return mp

    # --- basic properties ----------------------------------------------------
    @property
    def site_num(self):
        return len(self._mp)

    @property
    def threshold(self):
        return self.compress_config.threshold

    @threshold.setter
    def threshold(self, v):
        self.compress_config.threshold = v

    @property
    def is_mps(self):
        raise NotImplementedError

    @property
    def is_mpo(self):
        raise NotImplementedError

    @property
    def is_mpdm(self):
        raise NotImplementedError

    @property
    def is_complex(self):
        return np.dtype(self.dtype) == np.dtype(backend.complex_dtype)

    @property
    def bond_dims(self) -> List:
        if not self.site_num:
            return []
        return [int(mt.shape[0]) for mt in self] + [int(self[-1].shape[-1])]

    vbond_list = vbond_dims = bond_list = bond_dims

    @property
    def bond_dims_mean(self) -> int:
        return int(round(np.mean(self.bond_dims)))

    @property
    def pbond_dims(self):
        return self.model.pbond_list

    pbond_list = pbond_dims

    @property
    def bond_dims_exact(self) -> np.ndarray:
        pbond = np.array(self.pbond_dims, dtype=float)
        if self.is_mpo or self.is_mpdm:
            pbond = pbond ** 2
        with np.errstate(over="ignore"):
            dims1 = [1] + list(np.cumprod(pbond))
            dims2 = ([1] + list(np.cumprod(pbond[::-1])))[::-1]
        return np.minimum(dims1, dims2)

    @property
    def total_bytes(self):
        return sum(mt.nbytes for mt in self)

    def _get_sigmaqn(self, idx):
        raise NotImplementedError

    def _pdim(self, idx):
        """physical dims of site idx as a tuple"""
        shape = self[idx].shape
        return tuple(shape[1:-1])

    # --- qn bookkeeping ------------------------------------------------------
    def build_empty_qn(self):
        self.qntot = np.zeros(self.model.qn_size, dtype=int)
        if self.qnidx is None:
            self.qnidx = len(self) - 1
        self.qn = [
            np.zeros((dim, self.model.qn_size), dtype=int) for dim in self.bond_dims
        ]
        if self.to_right is None:
            self.to_right = False

    def build_none_qn(self):
        self.qntot = self.qnidx = self.qn = self.to_right = None

    def move_qnidx(self, dstidx: int):
        """Move the L/R quantum-number boundary (reference ``mp.py:159-172``)."""
        for idx in range(self.qnidx + 1, self.site_num + 1):
            self.qn[idx] = self.qntot - self.qn[idx]
        for idx in range(self.site_num, dstidx, -1):
            self.qn[idx] = self.qntot - self.qn[idx]
        self.qnidx = dstidx

    def _get_big_qn(self, cidx: List[int], swap=False):
        """Super-L/R-block quantum numbers around the active site(s)
        (reference ``mp.py:308-352``)."""
        if len(cidx) == 2:
            cidx = sorted(cidx)
            assert cidx[0] + 1 == cidx[1]
        elif len(cidx) > 2:
            raise AssertionError
        assert self.qnidx in cidx

        sigmaqn = [np.array(self._get_sigmaqn(idx)) for idx in cidx]
        if swap:
            assert len(sigmaqn) == 2
            sigmaqn = sigmaqn[::-1]
        qnl = np.array(self.qn[cidx[0]])
        qnr = np.array(self.qn[cidx[-1] + 1])
        if len(cidx) == 1:
            if self.to_right:
                qnbigl, qnbigr = add_outer(qnl, sigmaqn[0]), qnr
            else:
                qnbigl, qnbigr = qnl, add_outer(sigmaqn[0], qnr)
        else:
            qnbigl = add_outer(qnl, sigmaqn[0])
            qnbigr = add_outer(sigmaqn[1], qnr)
        qnmat = add_outer(qnbigl, qnbigr)
        return qnbigl, qnbigr, qnmat

    # --- canonical form -------------------------------------------------------
    def check_left_canonical(self, rtol=None, atol=None):
        return all(check_orthogonal(self[i], True, rtol, atol) for i in range(len(self) - 1))

    def check_right_canonical(self, rtol=None, atol=None):
        return all(check_orthogonal(self[i], False, rtol, atol) for i in range(1, len(self)))

    @property
    def is_left_canonical(self):
        return self.qnidx == self.site_num - 1

    @property
    def is_right_canonical(self):
        return self.qnidx == 0

    def ensure_left_canonical(self, rtol=None, atol=None):
        if (
            self.to_right
            or self.qnidx != self.site_num - 1
            or (not self.check_left_canonical(rtol, atol))
        ):
            self.move_qnidx(0)
            self.to_right = True
            return self.canonicalise()
        return self

    def ensure_right_canonical(self, rtol=None, atol=None):
        if (
            (not self.to_right)
            or self.qnidx != 0
            or (not self.check_right_canonical(rtol, atol))
        ):
            self.move_qnidx(self.site_num - 1)
            self.to_right = False
            return self.canonicalise()
        return self

    def iter_idx_list(self, full: bool, stop_idx: int = None):
        """Site indices of a sweep in the current direction
        (reference ``mp.py:230-243``)."""
        if self.to_right:
            last = stop_idx if stop_idx is not None else (self.site_num if full else self.site_num - 1)
            return range(self.qnidx, last)
        last = stop_idx if stop_idx is not None else (-1 if full else 0)
        return range(self.qnidx, last, -1)

    def _switch_direction(self):
        assert self.to_right is not None
        if self.to_right:
            self.qnidx = self.site_num - 1
            self.to_right = False
        else:
            self.qnidx = 0
            self.to_right = True

    def _update_ms(self, idx, u, vt, sigma=None, qnlset=None, qnrset=None, m_trunc=None):
        """Write the truncated factors back around site ``idx``
        (reference ``mp.py:245-295``)."""
        if m_trunc is None:
            m_trunc = u.shape[1]
        u = u[:, :m_trunc]
        vt = vt[:m_trunc, :]
        if sigma is None:
            # QR canonicalization: for MPO keep norms balanced
            if self.is_mpo:
                if self.to_right:
                    norm = jnp.linalg.norm(vt)
                else:
                    norm = jnp.linalg.norm(u)
                if self.to_right:
                    u = u * norm
                    vt = vt / norm
                else:
                    u = u / norm
                    vt = vt * norm
        else:
            sigma = jnp.asarray(sigma[:m_trunc]).astype(u.dtype)
            if (not self.is_mpo and self.to_right) or (self.is_mpo and not self.to_right):
                vt = sigma[:, None] * vt
            else:
                u = u * sigma[None, :]
        pdim = list(self._pdim(idx))
        if self.to_right:
            self[idx + 1] = tensordot1(vt, self[idx + 1])
            self[idx] = u.reshape([u.shape[0] // int(np.prod(pdim))] + pdim + [m_trunc])
            if qnlset is not None:
                self.qn[idx + 1] = np.array(qnlset[:m_trunc])
                self.qnidx = idx + 1
        else:
            self[idx - 1] = tensordot1(self[idx - 1], u)
            self[idx] = vt.reshape([m_trunc] + pdim + [vt.shape[1] // int(np.prod(pdim))])
            if qnrset is not None:
                self.qn[idx] = np.array(qnrset[:m_trunc])
                self.qnidx = idx - 1
        self._offload_cold_sites(self.qnidx)

    def _push_cano(self, idx):
        """Move the canonical center across site ``idx`` by blockwise QR
        (reference ``mp.py:890-908``)."""
        qnbigl, qnbigr, _ = self._get_big_qn([idx])
        system = "L" if self.to_right else "R"
        if trunc_device.linalg_enabled(self[idx]):
            # fully asynchronous on-device blockwise QR (no host sync at all)
            u, qnlset, v, qnrset = trunc_device.qr_qn_device(
                self[idx], qnbigl, qnbigr, self.qntot, system
            )
        else:
            u, qnlset, v, qnrset = svd_qn.svd_qn(
                self[idx], qnbigl, qnbigr, self.qntot,
                QR=True, system=system, full_matrices=False,
            )
        self._update_ms(idx, u, v.T, sigma=None, qnlset=qnlset, qnrset=qnrset)

    def canonicalise(self, stop_idx: int = None):
        if self.to_right:
            assert self.qnidx == 0
        else:
            assert self.qnidx == self.site_num - 1
        idx = self.qnidx
        for idx in self.iter_idx_list(full=False, stop_idx=stop_idx):
            self._push_cano(idx)
        if (not self.to_right and idx == 1) or (self.to_right and idx == self.site_num - 2):
            self._switch_direction()
        return self

    # --- compression -----------------------------------------------------------
    def compress(self, temp_m_trunc=None, ret_s=False):
        """SVD-compress a canonicalised MP (reference ``mp.py:437-511``)."""
        if self.to_right:
            assert self.qnidx == 0
        else:
            assert self.qnidx == self.site_num - 1
        if self.compress_config.bonddim_should_set:
            self.compress_config.set_bonddim(len(self) + 1)
        system = "L" if self.to_right else "R"
        sz_before = self.total_bytes

        s_list = []
        for idx in self.iter_idx_list(full=False):
            qnbigl, qnbigr, _ = self._get_big_qn([idx])
            res = None
            if trunc_device.linalg_enabled(self[idx]):
                res = trunc_device.compress_factors(
                    self[idx], qnbigl, qnbigr, self.qntot, system
                )
            if res is None:
                res = svd_qn.svd_qn(
                    self[idx], qnbigl, qnbigr, self.qntot,
                    system=system, full_matrices=False,
                )
            u, sigma, qnlset, v, _, qnrset = res
            vt = v.T
            s_list.append(sigma)
            if temp_m_trunc is None:
                m_trunc = self.compress_config.compute_m_trunc(sigma, idx, self.to_right)
            else:
                if isinstance(temp_m_trunc, (list, tuple, np.ndarray)):
                    m_trunc = temp_m_trunc[idx + 1 if self.to_right else idx]
                else:
                    m_trunc = temp_m_trunc
                m_trunc = int(min(m_trunc, len(sigma)))
            self._update_ms(idx, u, vt, sigma, qnlset, qnrset, m_trunc)

        self._switch_direction()
        ratio = sz_before / max(self.total_bytes, 1)
        logger.debug(
            f"size before/after compress: {sizeof_fmt(sz_before)}/"
            f"{sizeof_fmt(self.total_bytes)}, ratio: {ratio}"
        )
        if not ret_s:
            return self
        max_len = max(len(s) for s in s_list)
        s_array = np.array([np.pad(np.asarray(s), (0, max_len - len(s))) for s in s_list])
        return self, s_array

    def variational_compress(self, mpo=None, guess=None):
        """Variational (sweeping-fit) compression of ``mpo @ self``
        (reference ``mp.py:514-649``)."""
        if mpo is None:
            raise NotImplementedError(
                "SVD compression is preferred for a standalone MP."
            )
        if guess is None:
            compressed_mpo = mpo.copy().canonicalise().compress(
                temp_m_trunc=self.compress_config.vguess_m[0]
            )
            compressed_mps = self.copy().canonicalise().compress(
                temp_m_trunc=self.compress_config.vguess_m[1]
            )
            guess = compressed_mpo.apply(compressed_mps)
        mps = guess
        mps.ensure_left_canonical()
        logger.info(f"initial guess bond dims: {mps.bond_dims}")
        procedure = mps.compress_config.vprocedure
        method = mps.compress_config.vmethod

        environ = Environ(self, mpo, "L", mps_conj=mps.conj())
        mps_old = None
        for isweep, (compress_config, percent) in enumerate(procedure):
            logger.debug(f"isweep: {isweep}, bond dims: {mps.bond_dims}")
            if isinstance(compress_config, CompressConfig):
                mps.compress_config = compress_config
            elif isinstance(compress_config, int):
                mps.compress_config = CompressConfig(
                    CompressCriteria.fixed, max_bonddim=compress_config
                )
            else:
                raise AssertionError

            for imps in mps.iter_idx_list(full=True):
                if method == "2site" and (
                    (mps.to_right and imps == mps.site_num - 1)
                    or ((not mps.to_right) and imps == 0)
                ):
                    break
                if mps.to_right:
                    lmethod, rmethod = "System", "Enviro"
                else:
                    lmethod, rmethod = "Enviro", "System"
                if method == "1site":
                    lidx, cidx, ridx = imps - 1, [imps], imps + 1
                elif mps.to_right:
                    lidx, cidx, ridx = imps - 1, [imps, imps + 1], imps + 2
                else:
                    lidx, cidx, ridx = imps - 2, [imps - 1, imps], imps + 1

                mps_conj = mps.conj()
                ltensor = environ.GetLR("L", lidx, self, mpo, method=lmethod, mps_conj=mps_conj)
                rtensor = environ.GetLR("R", ridx, self, mpo, method=rmethod, mps_conj=mps_conj)

                qnbigl, qnbigr, qnmat = mps._get_big_qn(cidx)
                qn_mask = get_qn_mask(qnmat, mps.qntot)
                cmo = [mpo[i] for i in cidx]
                if method == "1site":
                    cms = self[cidx[0]]
                else:
                    cms = tensordot1(self[cidx[0]], self[cidx[1]])
                hop = hop_expr(ltensor, rtensor, cmo, cms.shape)
                cout = hop(cms)
                cout = jnp.where(jnp.asarray(qn_mask), cout, 0)
                mps._update_mps(cout, cidx, qnbigl, qnbigr, percent)
                if mps.compress_config.ofs is not None:
                    raise NotImplementedError(
                        "OFS for variational compress not implemented"
                    )
            mps._switch_direction()

            if isweep > 0 and percent == 0 and mps_old is not None:
                error = mps.distance(mps_old) / np.sqrt(abs(mps.dot(mps.conj()).real))
                logger.info(f"Variational compress relative error: {error}")
                if error < mps.compress_config.vrtol:
                    logger.info("Variational compress is converged!")
                    break
            mps_old = mps.copy()
        else:
            logger.warning(
                "Variational compress is not converged! Please increase the procedure!"
            )
        mps.canonicalise()
        logger.info(f"{mps}")
        return mps

    def _update_mps(self, cstruct, cidx, qnbigl, qnbigr, percent=0):
        """Truncate the active-site coefficient and write the renormalized
        basis back (reference ``mp.py:651-888``), including the state-averaged
        density-matrix path and on-the-fly swapping (OFS)."""
        system = "L" if self.to_right else "R"
        if self.compress_config.bonddim_should_set:
            self.compress_config.set_bonddim(len(self) + 1)

        averaged_ms = None
        if not isinstance(cstruct, list):
            if self.compress_config.ofs is None:
                if trunc_device.linalg_enabled(cstruct):
                    dev = self._update_mps_device(
                        cstruct, cidx, qnbigl, qnbigr, system, percent
                    )
                    if dev is not None:
                        ms, msdim, msqn, compms = dev
                        return self._write_back(
                            None, cstruct, cidx, ms, msdim, msqn, compms, None
                        )
                # complement padding (zero-singular-value columns) only
                # matters when `percent` forces allocation into empty
                # sectors; at percent=0 only the top singular vectors are
                # kept, and skipping the pads halves the LAPACK cost
                res = svd_qn.svd_qn(
                    cstruct, qnbigl, qnbigr, self.qntot, system=system,
                    full_matrices=(percent != 0),
                )
                Uset, SUset, qnlnew, Vset, SVset, qnrnew = res
            else:
                (Uset, SUset, qnlnew, Vset, SVset, qnrnew), cstruct, qnbigl, qnbigr = \
                    self._ofs_select(cstruct, cidx, qnbigl, qnbigr, system)
            if self.to_right:
                m_trunc = self.compress_config.compute_m_trunc(SUset, cidx[0], True)
                ms, msdim, msqn, compms = select_basis(
                    Uset, SUset, qnlnew, Vset, m_trunc, percent=percent
                )
                ms = ms.reshape(list(qnbigl.shape[:-1]) + [msdim])
                compms = jnp.moveaxis(
                    compms.reshape(list(qnbigr.shape[:-1]) + [msdim]), -1, 0
                )
            else:
                m_trunc = self.compress_config.compute_m_trunc(SVset, cidx[-1], False)
                ms, msdim, msqn, compms = select_basis(
                    Vset, SVset, qnrnew, Uset, m_trunc, percent=percent
                )
                ms = jnp.moveaxis(ms.reshape(list(qnbigr.shape[:-1]) + [msdim]), -1, 0)
                compms = compms.reshape(list(qnbigl.shape[:-1]) + [msdim])
        else:
            # state-averaged: diagonalize the averaged density matrix
            ddm = 0.0
            for c in cstruct:
                c = jnp.asarray(c)
                if self.to_right:
                    ax = tuple(range(qnbigl.ndim - 1, c.ndim))
                else:
                    ax = tuple(range(qnbigl.ndim - 1))
                axes = (ax, ax)
                ddm = ddm + jnp.tensordot(c, c.conj(), axes=axes)
            ddm = ddm / len(cstruct)
            Uset, Sset, qnnew = svd_qn.eigh_qn(ddm, qnbigl, qnbigr, self.qntot, system)
            m_trunc = self.compress_config.compute_m_trunc(
                Sset, cidx[0] if self.to_right else cidx[-1], self.to_right
            )
            ms, msdim, msqn, _ = select_basis(Uset, Sset, qnnew, None, m_trunc, percent=percent)
            rotated_c = []
            if self.to_right:
                ms = ms.reshape(list(qnbigl.shape[:-1]) + [msdim])
                for c in cstruct:
                    rotated_c.append(
                        jnp.tensordot(
                            ms.conj(), jnp.asarray(c),
                            axes=(tuple(range(qnbigl.ndim - 1)), tuple(range(qnbigl.ndim - 1))),
                        )
                    )
                compms = rotated_c[0]
            else:
                ms = ms.reshape(list(qnbigr.shape[:-1]) + [msdim])
                for c in cstruct:
                    rotated_c.append(
                        jnp.tensordot(
                            jnp.asarray(c), ms.conj(),
                            axes=(
                                tuple(range(qnbigl.ndim - 1, jnp.asarray(cstruct[0]).ndim)),
                                tuple(range(qnbigr.ndim - 1)),
                            ),
                        )
                    )
                compms = rotated_c[0]
                ms = jnp.moveaxis(ms, -1, 0)
            averaged_ms = []

        return self._write_back(
            averaged_ms, cstruct, cidx, ms, msdim, msqn, compms,
            rotated_c if isinstance(cstruct, list) else None,
        )

    def _update_mps_device(self, cstruct, cidx, qnbigl, qnbigr, system, percent):
        """On-device truncation of the active-site coefficient: randomized
        sector-pure candidates + host index selection + device gather/rotate
        (see ``trunc_device.py``).  Only the candidate singular values cross
        the device boundary — and in async mode (steady-state sweeps with an
        unchanged qn pattern) not even those: the selection reuses the
        previous sweep's spectrum, fetched asynchronously in the meantime,
        so the whole site update is dispatch-only."""
        from renormalizer_tpu.mps.lib import select_indices

        from renormalizer_tpu.utils.configs import CompressCriteria as _CC

        m = int(np.prod(qnbigl.shape[:-1]))
        n = int(np.prod(qnbigr.shape[:-1]))
        bond_idx = cidx[0] if self.to_right else cidx[-1]
        fixed = self.compress_config.criteria is _CC.fixed
        sketched = False
        if fixed:
            cap = self.compress_config.compute_m_trunc(
                np.full(min(m, n), np.inf), bond_idx, self.to_right
            )
        else:
            # threshold criteria need the top of the spectrum down to the
            # threshold cut: full-rank (exact) candidates while cheap, a
            # sketch with an exact-Frobenius-norm correction beyond that
            # (validated below: every saturated sector must reach the cut,
            # else host fallback)
            cap = min(m, n)
            if cap > trunc_device.exact_cap():
                cap = trunc_device.sketch_cap()
                sketched = True
        use_async = fixed and percent == 0 and trunc_device.async_enabled()
        plan_key = (tuple(cidx), bool(self.to_right))
        pattern = None
        if use_async:
            import hashlib

            h = hashlib.blake2b(digest_size=16)
            h.update(np.ascontiguousarray(qnbigl).tobytes())
            h.update(np.ascontiguousarray(qnbigr).tobytes())
            h.update(str((tuple(np.atleast_1d(self.qntot)), cap, system)).encode())
            pattern = h.digest()
        parts, lam, qn_list, layout = trunc_device.candidates(
            cstruct, qnbigl, qnbigr, self.qntot, system, cap,
            want_complement=(percent != 0), fetch=not use_async,
            return_layout=True,
        )
        sigma = None
        counts = None
        if use_async:
            plan = self._trunc_plans.get(plan_key)
            nvisit = plan[4] if (plan is not None and len(plan) > 4) else 0
            revalidate = trunc_device.static_revalidate_interval()
            if revalidate:
                # STAGGER the per-site revalidation phase: every site's plan
                # arms in the same sweep, so with a uniform interval all ~2N
                # plans would re-sync (one blocking relay RTT each, plus any
                # selection-drift recompiles) in the SAME sweep — measured in
                # round 4 as a few measured sweeps 7-21x slower than the
                # rest.  A per-plan-key offset spreads the re-syncs across
                # sweeps, bounding the per-sweep revalidation cost to ~one
                # site.
                revalidate += int.from_bytes(pattern[:2], "little") % revalidate
            if (plan is not None and plan[0] == pattern
                    and plan[2] is not None and plan[3] == layout
                    and not (revalidate and nvisit + 1 >= revalidate)):
                # Plan-constrained STATIC selection: the batched kernels
                # emit each sector's candidates in descending-lambda order,
                # so with the per-sector keep counts frozen by the plan the
                # selected slots are exactly the first k_i of each sector —
                # no device data is needed at all, and (unlike the stale-
                # spectrum reuse) the kept columns are the CURRENT sweep's
                # top states.  This removes the last per-update host sync
                # (each one costs a full relay RTT, ~34 ms measured).
                counts = plan[2]
                nvisit += 1
                trunc_device.PLAN_STATS["static"] += 1
            elif plan is not None and plan[0] == pattern:
                # previous visit's spectrum: already copied to the host.
                # Also the periodic revalidation path: every
                # ``static_revalidate_interval`` static visits the selection
                # is re-derived from the (one-sweep-stale) spectrum so that
                # drifting sector weights (fixed-M TDVP, pre-convergence
                # DMRG) cannot lock in an early cross-sector allocation
                # forever; the re-arm below restores the static path when
                # the counts still match a top-k pattern.
                sigma = trunc_device.lam_to_sigma(plan[1])
                nvisit = 0
                trunc_device.PLAN_STATS["stale"] += 1
            else:
                sigma = trunc_device.lam_to_sigma(lam)  # sync once
                nvisit = 0
                trunc_device.PLAN_STATS["sync"] += 1
                trunc_device.PLAN_STATS.setdefault("sync_sites", []).append(
                    (plan_key,
                     "no-plan" if plan is None
                     else "pattern" if plan[0] != pattern
                     else "layout" if plan[3] != layout
                     else "unarmed"))
            try:
                lam.copy_to_host_async()
            except Exception:
                pass
            self._trunc_plans[plan_key] = (pattern, lam, counts, layout, nvisit)
        else:
            sigma = lam
        if counts is not None:
            # static path: first k_i slots of each sector (see above)
            nsec_l, l1p_l = layout
            sidx = np.concatenate(
                [np.arange(k, dtype=np.int64) + i * l1p_l
                 for i, k in enumerate(counts) if k]
            )
            msdim = len(sidx)
            msqn = np.array([qn_list[i] for i in sidx])
            ms, compms = trunc_device.apply_selection(
                cstruct, parts, sidx, m, n, system,
                lshape=qnbigl.shape[:-1], rshape=qnbigr.shape[:-1],
            )
            if trunc_device.verify_level():
                # the zero-sync production path must not be the only one
                # without optional runtime verification; the debug tier
                # already syncs, so fetching the current spectrum is fine
                ms_mat = (ms.reshape(m, msdim) if self.to_right
                          else jnp.moveaxis(ms, 0, -1).reshape(n, msdim))
                trunc_device.verify_update(
                    ms_mat, cstruct, trunc_device.lam_to_sigma(lam), sidx,
                    m, n, system,
                    label=f"static cidx={cidx} to_right={self.to_right}",
                    replay=(qnbigl, qnbigr, self.qntot, cap),
                )
            return ms, msdim, msqn, compms
        # bucketed kernels mark pad candidate slots with sigma = -1; they
        # must count toward neither the bond-dimension target nor selection
        total_norm = None
        if sketched:
            # exact ||C||_F so the threshold criterion normalizes against
            # the true spectrum norm, not the sketched top of it
            total_norm = trunc_device.frob_norm(cstruct)
            thr_abs = self.compress_config.threshold * total_norm
            sat = trunc_device.OVERSAMPLE + cap
            by_qn = {}
            for q, s in zip(qn_list, np.asarray(sigma)):
                if s >= 0:
                    cnt, smin = by_qn.get(q, (0, np.inf))
                    by_qn[q] = (cnt + 1, min(smin, s))
            for cnt, smin in by_qn.values():
                if cnt >= sat and smin > thr_abs:
                    # a saturated sector's spectrum never reached the
                    # threshold cut: the sketch may have missed kept states
                    return None  # host fallback (exact spectrum)
        m_trunc = self.compress_config.compute_m_trunc(
            sigma[sigma >= 0], bond_idx, self.to_right, total_norm=total_norm)
        sidx = select_indices(sigma, qn_list, m_trunc, percent)
        # canonical slot order (sector-major, lambda-descending within each
        # sector): the plan-constrained static path emits this order, and
        # the new bond's qn ORDER feeds the neighboring site's qn digest —
        # if the two paths ordered the basis differently, every static
        # visit would flip the neighbor's pattern and force it back to a
        # sync visit, alternating forever (measured as whole sweeps
        # flip-flopping between 1 s and 25 s)
        sidx = sorted(sidx)
        # Selection HYSTERESIS (round-5): at steady state the cross-sector
        # allocation has near-degenerate ties, and a revalidation visit that
        # re-derives the selection can flip between tied splits.  Every flip
        # changes bond shapes and RECOMPILES every downstream executable
        # (measured: one flipped site = +1 trace, +350-700 XLA compiles,
        # a 0.7 s sweep becoming 3-28 s for several sweeps).  Keep the
        # plan's frozen counts unless the fresh selection is MATERIALLY
        # better (relative kept-weight improvement above tolerance).
        #
        # The comparison deliberately does NOT require the qn digest to
        # match: a tied flip at one site changes the DOWNSTREAM sites'
        # digests, so with a pattern-gated hysteresis one flip forces the
        # whole downstream chain back to blocking sync visits every sweep
        # (profiled steady state: 4-9 of 18 updates stuck on the sync path,
        # ~60 ms each).  The frozen counts only need the sector LAYOUT to
        # match — the fresh spectrum (already fetched on this visit) then
        # proves them near-optimal or replaces them.
        if (use_async and plan is not None
                and plan[2] is not None and plan[3] == layout):
            nsec_l, l1p_l = layout
            old_sidx = sorted(
                i * l1p_l + k
                for i, cnt in enumerate(plan[2]) for k in range(cnt)
            )
            if old_sidx != sidx and len(old_sidx) == len(sidx):
                w = np.square(np.asarray(sigma, dtype=float))
                w_old = w[old_sidx]
                if np.all(np.asarray(sigma)[old_sidx] >= 0):
                    gain = w[sidx].sum() - w_old.sum()
                    rtol = float(os.environ.get(
                        "RENO_TRUNC_HYSTERESIS", "1e-6"))
                    if gain <= rtol * max(w_old.sum(), np.finfo(float).tiny):
                        sidx = old_sidx
        if use_async and layout is not None:
            # Arm the static path for the next visit IF this selection is
            # exactly "top k_i of each sector" (it is whenever no sentinel
            # slot interleaves the kept range): record the per-sector keep
            # counts so the next visit needs no spectrum at all.
            nsec_l, l1p_l = layout
            new_counts = [0] * nsec_l
            for i in sidx:
                new_counts[i // l1p_l] += 1
            is_topk = all(
                (i % l1p_l) < new_counts[i // l1p_l] for i in sidx
            )
            if is_topk and len(sidx):
                plan = self._trunc_plans.get(plan_key)
                if plan is not None:
                    self._trunc_plans[plan_key] = (
                        plan[0], plan[1], tuple(new_counts), layout,
                        plan[4] if len(plan) > 4 else 0)
            else:
                trunc_device.PLAN_STATS["noarm"] += 1
        msdim = len(sidx)
        msqn = np.array([qn_list[i] for i in sidx])
        ms, compms = trunc_device.apply_selection(
            cstruct, parts, sidx, m, n, system,
            lshape=qnbigl.shape[:-1], rshape=qnbigr.shape[:-1],
        )
        if trunc_device.verify_level():
            ms_mat = (ms.reshape(m, msdim) if self.to_right
                      else jnp.moveaxis(ms, 0, -1).reshape(n, msdim))
            trunc_device.verify_update(
                ms_mat, cstruct, sigma, sidx, m, n, system,
                label=f"cidx={cidx} to_right={self.to_right} cap={cap}",
                replay=(qnbigl, qnbigr, self.qntot, cap),
            )
        return ms, msdim, msqn, compms

    def _write_back(self, averaged_ms, cstruct, cidx, ms, msdim, msqn, compms,
                    rotated_c):
        # write the factors back into the chain
        if len(cidx) == 1:
            self[cidx[0]] = ms
            if self.to_right:
                if cidx[0] != self.site_num - 1:
                    if isinstance(cstruct, list):
                        for c in rotated_c:
                            averaged_ms.append(tensordot1(c, self[cidx[0] + 1]))
                    self[cidx[0] + 1] = tensordot1(compms, self[cidx[0] + 1])
                    self.qn[cidx[0] + 1] = msqn
                    self.qnidx = cidx[0] + 1
                else:
                    if isinstance(cstruct, list):
                        for c in rotated_c:
                            averaged_ms.append(tensordot1(self[cidx[0]], c))
                    self[cidx[0]] = tensordot1(self[cidx[0]], compms)
                    self.qnidx = self.site_num - 1
            else:
                if cidx[0] != 0:
                    if isinstance(cstruct, list):
                        for c in rotated_c:
                            averaged_ms.append(tensordot1(self[cidx[0] - 1], c))
                    self[cidx[0] - 1] = tensordot1(self[cidx[0] - 1], compms)
                    self.qn[cidx[0]] = msqn
                    self.qnidx = cidx[0] - 1
                else:
                    if isinstance(cstruct, list):
                        for c in rotated_c:
                            averaged_ms.append(tensordot1(c, self[cidx[0]]))
                    self[cidx[0]] = tensordot1(compms, self[cidx[0]])
                    self.qnidx = 0
        else:
            if self.to_right:
                self[cidx[0]] = ms
                self[cidx[1]] = compms
                self.qnidx = cidx[1]
            else:
                self[cidx[1]] = ms
                self[cidx[0]] = compms
                self.qnidx = cidx[0]
            if isinstance(cstruct, list):
                averaged_ms = rotated_c
            self.qn[cidx[1]] = msqn
        self._offload_cold_sites(self.qnidx)
        return averaged_ms

    def _ofs_select(self, cstruct, cidx, qnbigl, qnbigr, system):
        """On-the-fly swapping: decide whether to swap the two active DoFs
        by comparing entropy / discarded weight of the two orderings
        (reference ``mp.py:696-757``)."""
        from renormalizer_tpu.model import Model as _Model
        from renormalizer_tpu.model.model import HolsteinModel as _HolsteinModel

        if isinstance(self.model, _HolsteinModel):
            raise NotImplementedError("Can't perform OFS on Holstein model")

        res1 = svd_qn.svd_qn(cstruct, qnbigl, qnbigr, self.qntot, system=system)
        qnbigl2, qnbigr2, _ = self._get_big_qn(cidx, swap=True)
        c = jnp.asarray(cstruct)
        if c.ndim == 4:
            cstruct2 = c.transpose(0, 2, 1, 3)
        else:
            assert c.ndim == 6
            cstruct2 = c.transpose(0, 3, 4, 1, 2, 5)
        if self.compress_config.ofs_swap_jw:
            assert cstruct2.ndim == 4
            cstruct2 = cstruct2.at[:, 1, 1, :].multiply(-1)
        res2 = svd_qn.svd_qn(cstruct2, qnbigl2, qnbigr2, self.qntot, system=system)

        SUset1, SUset2 = res1[1], res2[1]
        entropy1 = calc_vn_entropy(np.asarray(SUset1) ** 2)
        entropy2 = calc_vn_entropy(np.asarray(SUset2) ** 2)
        assert self.compress_config.criteria == CompressCriteria.fixed
        Mmax = self.compress_config.bond_dim_max_value
        loss1 = float((np.sort(np.asarray(SUset1))[::-1][Mmax:] ** 2).sum())
        loss2 = float((np.sort(np.asarray(SUset2))[::-1][Mmax:] ** 2).sum())
        ofs = self.compress_config.ofs
        if ofs is OFS.ofs_d:
            retain = loss1 <= loss2
        elif ofs is OFS.ofs_ds:
            retain = entropy1 <= entropy2 if (loss1 < 1e-10 and loss2 < 1e-10) else loss1 <= loss2
        elif ofs is OFS.ofs_s:
            retain = entropy1 <= entropy2
        else:
            assert ofs is OFS.ofs_debug
            retain = True
        logger.debug(
            f"OFS: site index {cidx}, should swap: {not retain}, "
            f"S: {entropy1}, {entropy2}, loss: {loss1}, {loss2}"
        )
        if retain:
            return res1, cstruct, qnbigl, qnbigr
        # swap the model's basis ordering
        new_basis = self.model.basis.copy()
        new_basis[cidx[0]:cidx[1] + 1] = reversed(self.model.basis[cidx[0]:cidx[1] + 1])
        self.model = _Model(
            new_basis, self.model.ham_terms, self.model.dipole, self.model.output_ordering
        )
        logger.debug(f"DOF ordering: {[b.dof for b in self.model.basis]}")
        return res2, cstruct2, qnbigl2, qnbigr2

    # --- algebra -----------------------------------------------------------------
    @property
    def mp_norm(self) -> float:
        from renormalizer_tpu.ops.contract import chain_overlap

        # conj happens inside the fused chain: no N-tensor conj + copy
        res = chain_overlap(list(self), list(self), conj_first=True).real
        if res < 0:
            assert np.abs(res) < 1e-8
            res = 0
        return float(np.sqrt(res))

    def add(self, other: "MatrixProduct"):
        """Direct (block-diagonal) sum of two MPs (reference ``mp.py:374-435``)."""
        assert np.all(self.qntot == other.qntot)
        assert self.site_num == other.site_num

        new_mps = self.metacopy()
        if other.is_complex:
            new_mps.dtype = backend.complex_dtype
        if self.is_complex:
            new_mps.dtype = backend.complex_dtype
        new_mps.compress_config.update(self.compress_config)
        dtype = new_mps.dtype

        if self.is_mps:
            new_mps[0] = jnp.concatenate(
                [jnp.asarray(self[0], dtype), jnp.asarray(other[0], dtype)], axis=2
            )
            for i in range(1, self.site_num - 1):
                mta, mtb = self[i], other[i]
                assert mta.shape[1] == mtb.shape[1]
                new_ms = jnp.zeros(
                    [mta.shape[0] + mtb.shape[0], mta.shape[1], mta.shape[2] + mtb.shape[2]],
                    dtype=dtype,
                )
                new_ms = new_ms.at[: mta.shape[0], :, : mta.shape[2]].set(mta.astype(dtype))
                new_ms = new_ms.at[mta.shape[0]:, :, mta.shape[2]:].set(mtb.astype(dtype))
                new_mps[i] = new_ms
            new_mps[-1] = jnp.concatenate(
                [jnp.asarray(self[-1], dtype), jnp.asarray(other[-1], dtype)], axis=0
            )
        elif self.is_mpo or self.is_mpdm:
            new_mps[0] = jnp.concatenate(
                [jnp.asarray(self[0], dtype), jnp.asarray(other[0], dtype)], axis=3
            )
            for i in range(1, self.site_num - 1):
                mta, mtb = self[i], other[i]
                new_ms = jnp.zeros(
                    [
                        mta.shape[0] + mtb.shape[0],
                        mta.shape[1], mta.shape[2],
                        mta.shape[3] + mtb.shape[3],
                    ],
                    dtype=dtype,
                )
                new_ms = new_ms.at[: mta.shape[0], :, :, : mta.shape[3]].set(mta.astype(dtype))
                new_ms = new_ms.at[mta.shape[0]:, :, :, mta.shape[3]:].set(mtb.astype(dtype))
                new_mps[i] = new_ms
            new_mps[-1] = jnp.concatenate(
                [jnp.asarray(self[-1], dtype), jnp.asarray(other[-1], dtype)], axis=0
            )
        else:
            raise AssertionError

        new_mps.move_qnidx(other.qnidx)
        new_mps.to_right = other.to_right
        new_mps.qn = [
            np.concatenate([np.asarray(q1), np.asarray(q2)])
            for q1, q2 in zip(self.qn, other.qn)
        ]
        new_mps.qn[0] = np.zeros((1, new_mps.qn[0].shape[1]), dtype=int)
        new_mps.qn[-1] = np.zeros((1, new_mps.qn[0].shape[1]), dtype=int)
        return new_mps

    def dot(self, other: "MatrixProduct") -> complex:
        """Overlap <self*|other> with both taken as-is
        (reference ``mp.py:933-956``).  The whole transfer-matrix chain is
        one jitted dispatch + one scalar fetch (the per-site dispatch chain
        dominated TDVP step time on the relay)."""
        assert len(self) == len(other)
        from renormalizer_tpu.ops.contract import chain_overlap

        return chain_overlap(list(self), list(other))

    def dot_ob(self, other: "MatrixProduct"):
        """Open-boundary dot with bond dimension > 1 at the edges
        (reference ``mp.py:958-979``)."""
        assert len(self) == len(other)
        e0 = jnp.tensordot(
            jnp.eye(self[0].shape[0]), jnp.eye(other[0].shape[0]), axes=0
        ).transpose(0, 2, 1, 3)
        for mt1, mt2 in zip(self, other):
            e0 = jnp.tensordot(e0, mt2, axes=1)
            if mt1.ndim == 3:
                e0 = jnp.tensordot(e0, mt1, axes=([2, 3], [0, 1])).transpose(0, 1, 3, 2)
            elif mt1.ndim == 4:
                e0 = jnp.tensordot(e0, mt1, axes=([2, 3, 4], [0, 1, 2])).transpose(0, 1, 3, 2)
            else:
                raise AssertionError
        return e0

    def angle(self, other):
        return abs(self.conj().dot(other))

    def scale(self, val, inplace=False):
        new_mp = self if inplace else self.copy()
        if np.iscomplex(val):
            new_mp.to_complex(inplace=True)
        else:
            val = val.real
        new_mp[self.qnidx] = new_mp[self.qnidx] * val
        return new_mp

    def conj(self):
        new_mp = self.metacopy()
        for idx, mt in enumerate(self):
            new_mp[idx] = mt.conj()
        return new_mp

    def to_complex(self, inplace=False):
        from renormalizer_tpu.ops.contract import safe_asarray

        new_mp = self if inplace else self.metacopy()
        new_mp.dtype = backend.complex_dtype
        for i, mt in enumerate(self):
            if mt is None:
                continue
            # upload first (split transfer for complex hosts arrays), THEN
            # convert on device: converting a host array to complex and
            # uploading it poisons the buffer on the axon relay
            new_mp[i] = safe_asarray(mt).astype(backend.complex_dtype)
        return new_mp

    def distance(self, other) -> float:
        l1 = self.conj().dot(self)
        l2 = other.conj().dot(other)
        l1dotl2 = self.conj().dot(other)
        d2 = (l1 + l2 - l1dotl2 - l1dotl2.conjugate()).real
        if d2 < 0:
            assert d2 / l1.real < 1e-8
            return 0.0
        return float(np.sqrt(d2))

    def copy(self):
        new = self.metacopy()
        for i in range(self.site_num):
            new[i] = self[i]
        new._mt_hashes = list(self._mt_hashes)
        return new

    def metacopy(self) -> "MatrixProduct":
        new = self.__class__.__new__(self.__class__)
        new._mp = [None] * len(self)
        new.dtype = self.dtype
        new.model = self.model.copy()
        new.compress_config = self.compress_config.copy()
        new.qn = [np.asarray(q).copy() for q in self.qn]
        new.qnidx = self.qnidx
        new.qntot = None if self.qntot is None else np.asarray(self.qntot).copy()
        new.to_right = self.to_right
        new._mt_hashes = [None] * len(self)
        new._cold_sites = set()
        new._trunc_plans = {}
        return new

    def build_empty_mp(self, num):
        self._mp = [None] * num
        self._mt_hashes = [None] * num

    # --- container protocol -------------------------------------------------------
    def append(self, array):
        mt = safe_asarray(array, dtype=self.dtype)
        if len(self._mp) != 0:
            assert mt.shape[0] == self._mp[-1].shape[-1]
        self._mp.append(mt)
        self._mt_hashes.append(_content_digest(array))

    def __getitem__(self, item):
        if isinstance(item, slice):
            return [self[i] for i in range(*item.indices(len(self._mp)))]
        if self._cold_sites:
            idx = item if item >= 0 else item + len(self._mp)
            if idx in self._cold_sites:
                from renormalizer_tpu.mps import offload

                self._mp[idx] = offload.to_device(self._mp[idx])
                self._cold_sites.discard(idx)
        return self._mp[item]

    def _offload_cold_sites(self, center: int):
        """Move big site tensors far from the sweep center to host RAM
        (HBM<->host analog of the reference's disk offload,
        ``mp.py:1047-1080``).  Active when RENO_HOST_OFFLOAD=N > 0; only
        tensors over ``compress_config.dump_matrix_size`` bytes (default:
        4 MiB when that knob is left at inf) are moved."""
        from renormalizer_tpu.mps import offload

        window = offload.hot_window()
        if not window:
            return
        threshold = self.compress_config.dump_matrix_size
        if not np.isfinite(threshold):
            threshold = 4 << 20
        for i, mt in enumerate(self._mp):
            if mt is None or abs(i - center) <= window or i in self._cold_sites:
                continue
            if mt.size * mt.dtype.itemsize >= threshold:
                self._mp[i] = offload.to_host(mt)
                self._cold_sites.add(i)

    def __setitem__(self, key, array):
        mt = safe_asarray(array, dtype=self.dtype)
        if mt.shape[1] != self.pbond_list[key if key >= 0 else key + self.site_num]:
            raise ValueError(
                "Matrix physical bond dimension does not match system information"
            )
        self._mp[key] = mt
        idx = key if key >= 0 else key + self.site_num
        self._cold_sites.discard(idx)
        if len(self._mt_hashes) <= idx:
            self._mt_hashes.extend([None] * (idx + 1 - len(self._mt_hashes)))
        self._mt_hashes[idx] = _content_digest(array)

    def __add__(self, other):
        return self.add(other)

    def __sub__(self, other):
        return self.add(other.scale(-1))

    def __mul__(self, other):
        assert isinstance(other, (float, complex))
        return self.scale(other)

    __rmul__ = __mul__

    def __eq__(self, other):
        for m1, m2 in zip(self, other):
            if m1.shape != m2.shape or not np.allclose(np.asarray(m1), np.asarray(m2)):
                return False
        return True

    def __ne__(self, other):
        return not self == other

    def __iter__(self):
        if not self._cold_sites:
            return iter(self._mp)
        return (self[i] for i in range(len(self._mp)))

    def __len__(self):
        return len(self._mp)

    def __repr__(self):
        return "%s with %d sites" % (self.__class__, len(self))

    def __str__(self):
        if self.is_mps:
            kind = "mps"
        elif self.is_mpo:
            kind = "mpo"
        elif self.is_mpdm:
            kind = "mpdm"
        else:
            raise AssertionError
        return "{} current size: {}, Matrix product bond dim:{}".format(
            kind, sizeof_fmt(self.total_bytes), self.bond_dims
        )
