r"""Jit-cached tensor contractions for the MPS engine.

Replaces the reference's opt_einsum expression cache
(``renormalizer/mps/oe_contract_wrap.py``, ``renormalizer/mps/hop_expr.py``,
``renormalizer/mps/lib.py:121-250``) with jitted ``jnp.einsum`` closures.
XLA chooses the contraction schedule and fuses onto the MXU; jax's compile
cache keys on shapes/dtypes so each (pattern, shape) pair compiles once.

Everything here takes and returns device arrays.  No host transfers.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp


# NOTE on cache bounds: every lru_cache here holds jitted closures.  An
# eviction does not just free memory — it discards the closure's jit trace
# cache, so the next call RETRACES and RE-LOWERS (tens of ms on host, and a
# fresh XLA compile over the tunneled device unless the persistent compile
# cache hits).  Round 4 bounded these caches (maxsize=256) and the DMRG
# steady-state sweep regressed ~14x from exactly this churn; the caches are
# unbounded again and the test suite's per-module conftest fixture handles
# memory instead (tests/conftest.py clears them explicitly).
@lru_cache(maxsize=None)
def _einsum_jit(formula: str, n: int):
    """A jitted einsum closure for `formula` over `n` operands."""

    @jax.jit
    def fn(*arrays):
        return jnp.einsum(formula, *arrays, optimize="optimal")

    return fn


@lru_cache(maxsize=None)
def _einsum_split_jit(formula: str, n: int):
    """Jitted einsum that lowers complex contractions to a single REAL
    einsum in the split (2x2-representation) layout.

    The tunneled TPU's compiler rejects any complex ``dot_general``
    (``UNIMPLEMENTED``), while elementwise complex ops work — so each
    complex operand travels as its real 2x2 matrix representation
    ``[[Re, -Im], [Im, Re]]`` over a fresh chain-axis pair; the chain is
    closed by a constant basis vector ``e0 = (1, 0)`` and the output's
    leading chain axis becomes the (Re, Im) component pair.  Because the
    2x2 representations of complex scalars commute, chaining the operands
    in their given order is always correct regardless of how opt_einsum
    schedules the contraction.  Real operands pass through untouched.
    Cost: at most 4x the real FLOPs of the native complex contraction."""
    import string

    ins, out = formula.split("->")
    terms = ins.split(",")
    assert len(terms) == n
    used = set(formula) - {",", "-", ">"}
    fresh = iter(c for c in string.ascii_letters if c not in used)

    letters = list(fresh)

    def build(complex_flags):
        links = list(letters[: sum(complex_flags) + 1])
        new_terms = []
        k = 0
        for term, is_c in zip(terms, complex_flags):
            if is_c:
                new_terms.append(links[k] + links[k + 1] + term)
                k += 1
            else:
                new_terms.append(term)
        new_terms.append(links[-1])  # the closing basis vector e0
        return ",".join(new_terms) + "->" + links[0] + out

    @jax.jit
    def fn(*arrays):
        from renormalizer_tpu.lib.split_complex import mat2

        flags = tuple(bool(jnp.issubdtype(a.dtype, jnp.complexfloating))
                      for a in arrays)
        if not any(flags):
            return jnp.einsum(formula, *arrays, optimize="optimal")
        ops = [mat2(a) if is_c else a for a, is_c in zip(arrays, flags)]
        rdt = ops[0].dtype if flags[0] else jnp.finfo(
            jnp.result_type(*[a.dtype for a in arrays])).dtype
        e0 = jnp.asarray([1.0, 0.0], dtype=rdt)
        f2 = build(flags)
        out2 = jnp.einsum(f2, *ops, e0, optimize="optimal")
        return jax.lax.complex(out2[0], out2[1])

    return fn


def safe_asarray(x, dtype=None):
    """Host->device upload that survives the axon relay's missing complex
    transfer support: complex host data is uploaded as two real transfers
    and combined on device with ``lax.complex``.

    Measured relay behavior (round-4 probes): complex *compute* on device is
    fully supported (einsum/dot_general/QR/eigh/SVD all pass), but any
    complex H2D or D2H *transfer* raises UNIMPLEMENTED — and because uploads
    are async, a poisoned buffer surfaces the error only at its first
    consumer, many dispatches later.  So the split-transfer discipline is
    UNCONDITIONAL on accelerator backends (it is cheap: two real copies plus
    one elementwise combine), independent of ``RENO_SPLIT_COMPLEX`` which
    now only controls whether *compute* also avoids complex dtypes.

    Handles python/numpy complex scalars and host-side dtype upcasts
    (``dtype=complex`` with real input) through the same split path; a
    ``jax.Array`` input is cast on device (convert ops are supported)."""
    import numpy as np

    if isinstance(x, jax.Array):
        if dtype is not None and x.dtype != jnp.dtype(dtype):
            return x.astype(dtype)
        return x
    want_complex = dtype is not None and jnp.issubdtype(
        jnp.dtype(dtype), jnp.complexfloating)
    is_complex_host = isinstance(x, complex) or (
        isinstance(x, (np.ndarray, np.generic)) and np.iscomplexobj(x))
    if (isinstance(x, complex) and dtype is None
            and jax.default_backend() != "cpu"):
        # scalar fast path: evolution uploads the SAME -i*dt every site;
        # cache the device scalar instead of re-uploading per call
        return _cached_complex_scalar(x)
    if (want_complex or is_complex_host) and jax.default_backend() != "cpu":
        arr = np.asarray(x, dtype=dtype) if dtype is not None else np.asarray(x)
        re = jnp.asarray(np.ascontiguousarray(arr.real))
        im = jnp.asarray(np.ascontiguousarray(arr.imag))
        return _complex_combine(re.shape, str(re.dtype))(re, im)
    if dtype is not None:
        return jnp.asarray(x, dtype=dtype)
    return jnp.asarray(x)


@lru_cache(maxsize=None)
def _complex_combine(shape, dtype_name):
    @jax.jit
    def run(re, im):
        return jax.lax.complex(re, im)

    return run


@lru_cache(maxsize=None)
def _cached_complex_scalar(value: complex):
    import numpy as np

    arr = np.asarray(value)
    re = jnp.asarray(np.ascontiguousarray(arr.real))
    im = jnp.asarray(np.ascontiguousarray(arr.imag))
    return _complex_combine(re.shape, str(re.dtype))(re, im)


def safe_eye(n, dtype=None):
    """Eager identity matrix that never uploads a complex constant: a
    complex-dtype ``jnp.eye`` outside jit transfers complex literals (the
    relay rejects the transfer and poisons the buffer); build real and
    convert on device instead."""
    if dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        real = jnp.eye(n, dtype=jnp.finfo(jnp.dtype(dtype)).dtype)
        return real.astype(dtype)
    return jnp.eye(n, dtype=dtype)


def safe_filled(shape, value, dtype=None):
    """Eager ``jnp.full`` with the same complex-constant discipline."""
    if dtype is not None and jnp.issubdtype(jnp.dtype(dtype), jnp.complexfloating):
        rdt = jnp.finfo(jnp.dtype(dtype)).dtype
        value = complex(value)
        re = jnp.full(shape, value.real, dtype=rdt)
        im = jnp.full(shape, value.imag, dtype=rdt)
        return _complex_combine(tuple(shape) if hasattr(shape, "__len__")
                                else (shape,), str(rdt))(re, im)
    return jnp.full(shape, value, dtype=dtype)


def eager_dtype_unify() -> bool:
    """Eager mixed-dtype promotion before jitted contractions (default ON:
    the tunneled TPU's compiler SIGABRTs on some mixed real/complex fused
    einsums).  ``RENO_EAGER_DTYPE_UNIFY=0`` lets XLA promote in-graph on
    stacks where that is safe."""
    import os

    return os.environ.get("RENO_EAGER_DTYPE_UNIFY", "1") != "0"


def _is_oom(exc: Exception) -> bool:
    msg = str(exc)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg


def _harmonize_devices(arrays):
    """Co-locate operands whose committed placements disagree (jit refuses
    them).  Mixed placements arise when mesh-replicated results (sector-
    parallel truncation under a sharded Davidson) meet single-device
    tensors: everything moves to the widest placement (the mesh one).

    Placement mixing is only possible when a global mesh is installed
    (``parallel.set_global_mesh``); with no mesh every array lives on the
    one default device, so this is a no-op checked with one cheap global
    read.  (Round 4 ran the per-operand ``a.devices()``/``str(a.sharding)``
    inspection unconditionally on every einsum dispatch — measurable python
    overhead in the dispatch-bound DMRG sweep for a case that cannot occur
    single-device.)"""
    from renormalizer_tpu.parallel.mesh import get_global_mesh

    if get_global_mesh() is None:
        return arrays
    metas = []
    for a in arrays:
        try:
            metas.append((len(a.devices()), a.sharding))
        except Exception:
            metas.append((1, None))
    if len({id_ for n, s in metas for id_ in ((n, str(s)),)}) <= 1:
        return arrays
    widest = max(range(len(arrays)), key=lambda i: metas[i][0])
    n_widest, sh = metas[widest]
    if sh is None:
        return arrays
    if all(n == n_widest and str(s) == str(sh) for n, s in metas):
        return arrays
    return [a if str(m[1]) == str(sh) else jax.device_put(a, sh)
            for a, m in zip(arrays, metas)]


def einsum(formula: str, *arrays):
    """Jit-cached einsum.  On HBM exhaustion, log the formula and operand
    shapes before re-raising (reference ``oe_contract_wrap.py:37-58``) —
    without this a multi-hour run dies with an opaque allocator error.

    Mixed real/complex operand lists are unified to the promoted dtype
    *before* the jitted call: an in-graph real->complex convert is legal XLA
    but crashes the tunneled-TPU compiler (round-2 ``ElementIsComplex``
    SIGABRT), and environment updates mix a complex state with a real MPO
    whenever real-time evolution runs."""
    arrays = [safe_asarray(a) for a in arrays]
    # dtype.kind is a plain numpy attribute read; jnp.issubdtype per operand
    # per call was measurable python overhead in the dispatch-bound sweep
    if any(a.dtype.kind == "c" for a in arrays):
        from renormalizer_tpu.lib.split_complex import split_complex_enabled

        if split_complex_enabled():
            # complex dot_general is UNIMPLEMENTED on the tunneled TPU;
            # lower the whole contraction to ONE real einsum in the 2x2
            # representation (complex reps commute, so any operand order
            # chains correctly).  Real operands must NOT be promoted to
            # complex here: even the eager astype would compile a complex
            # convert op on the relay.
            real_common = jnp.finfo(
                jnp.result_type(*[a.dtype for a in arrays])).dtype
            arrays = [
                a if jnp.issubdtype(a.dtype, jnp.complexfloating)
                else a.astype(real_common)
                for a in arrays
            ]
            arrays = _harmonize_devices(arrays)
            return _einsum_split_jit(formula, len(arrays))(*arrays)
        if eager_dtype_unify():
            # mixed real/complex operands inside ONE jitted einsum crash
            # the relay's compiler (SIGABRT, round-2 ElementIsComplex —
            # re-confirmed round 4), so promotion happens eagerly here.
            # The eager astype is a no-op dispatch when dtypes already
            # match; hot paths avoid the real converts entirely by handing
            # evolution a cached complex twin of the MPO
            # (``mps.complex_mpo``), making this loop free at steady state.
            common = jnp.result_type(*[a.dtype for a in arrays])
            arrays = [a if a.dtype == common else a.astype(common)
                      for a in arrays]
    arrays = _harmonize_devices(arrays)
    try:
        return _einsum_jit(formula, len(arrays))(*arrays)
    except Exception as e:
        if _is_oom(e):
            import logging

            logging.getLogger(__name__).fatal(
                "Device out of memory in einsum '%s' with operand shapes %s "
                "(dtypes %s). Reduce the bond dimension or enable host "
                "offload.", formula, [tuple(a.shape) for a in arrays],
                [str(a.dtype) for a in arrays],
            )
        raise


# --- environment single-site updates ------------------------------------
# diagrams (reference ``mps/lib.py:169-250``):
#   L-domain:  S-a-S-f      R-domain:  -f-S-a-S
#                  d                       d
#              O-b-O-g                 -g-O-b-O
#                  e                       e
#              S-c-S-h                 -h-S-c-S

_ENV_FORMULAS = {
    # (domain, ms_ndim): formula over (environ, ms_conj, mo, ms)
    ("L", 3): "abc,adf,bdeg,ceh->fgh",
    ("L", 4): "abc,adlf,bdeg,celh->fgh",
    ("R", 3): "abc,fda,gdeb,hec->fgh",
    ("R", 4): "abc,fdla,gdeb,helc->fgh",
}


@lru_cache(maxsize=None)
def _env_update_selfconj_jit(formula: str):
    """Environment update with the bra = ket*: the conjugation happens
    inside the jitted graph (an eager .conj() is one extra dispatch per
    site on the relay)."""

    @jax.jit
    def fn(environ, mo, ms):
        return jnp.einsum(formula, environ, ms.conj(), mo, ms,
                          optimize="optimal")

    return fn


def contract_one_site(environ, ms, mo, domain, ms_conj=None):
    """Absorb one (mps, mpo, mps*) column into an environment tensor.
    4-dim ``ms`` (MpDm) traces the ancilla index."""
    formula = _ENV_FORMULAS[(domain, ms.ndim)]
    if ms_conj is None:
        from renormalizer_tpu.lib.split_complex import split_complex_enabled

        ops = _harmonize_devices(
            [safe_asarray(environ), safe_asarray(mo), safe_asarray(ms)])
        any_cplx = any(a.dtype.kind == "c" for a in ops)
        uniform = len({str(a.dtype) for a in ops}) == 1
        # the fused in-graph-conj path needs uniform dtypes (mixed fused
        # einsums SIGABRT the relay compiler) and native complex support
        if uniform and not (any_cplx and split_complex_enabled()):
            return _env_update_selfconj_jit(formula)(*ops)
        ms_conj = ops[2].conj()
        environ, mo, ms = ops
    return einsum(formula, environ, ms_conj, mo, ms)


def contract_one_site_multi_mpo(environ, ms, mos, domain, ms_conj=None):
    """Environment update with a list of stacked MPOs
    (reference ``mps/lib.py:121-166``)."""
    if ms_conj is None:
        ms_conj = ms.conj()
    environ = jnp.asarray(environ)
    ms = jnp.asarray(ms)
    mos = [jnp.asarray(mo) for mo in mos]
    if domain == "L":
        if ms.ndim == 3:
            out = jnp.tensordot(environ, ms_conj, axes=([0], [0]))
            for mo in mos:
                out = jnp.tensordot(out, mo, axes=([0, -2], [0, 1]))
            out = jnp.tensordot(out, ms, axes=([0, -2], [0, 1]))
        elif ms.ndim == 4:
            out = jnp.tensordot(environ, ms_conj.transpose(0, 2, 1, 3), axes=([0], [0]))
            for mo in mos:
                out = jnp.tensordot(out, mo, axes=([0, -2], [0, 1]))
            out = jnp.tensordot(out, ms, axes=([0, 1, -2], [0, 2, 1]))
        else:
            raise ValueError(f"MPS ndim is not 3 or 4, got {ms.ndim}")
    else:
        if ms.ndim == 3:
            out = jnp.tensordot(environ, ms_conj, axes=([0], [-1]))
            for mo in mos:
                out = jnp.tensordot(out, mo, axes=([0, -1], [-1, 1]))
            out = jnp.tensordot(out, ms, axes=([0, -1], [-1, 1]))
        elif ms.ndim == 4:
            out = jnp.tensordot(environ, ms_conj.transpose(0, 2, 1, 3), axes=([0], [-1]))
            for mo in mos:
                out = jnp.tensordot(out, mo, axes=([0, -1], [-1, 1]))
            out = jnp.tensordot(out, ms, axes=([0, 2, -1], [-1, 2, 1]))
        else:
            raise ValueError(f"MPS ndim is not 3 or 4, got {ms.ndim}")
    return out


# --- effective-Hamiltonian matvecs ---------------------------------------
# hop(c) = L . W[...] . R . c, the hot loop of DMRG and TDVP
# (reference ``mps/hop_expr.py:7-117``); formulas keyed by
# (nsite, ancilla, twolayer)

_HOP_FORMULAS = {
    # zero site: S-a l-S / O-b b-O / S-c k-S
    (0, False, False): ("abc,lbk,ck->al", 2),
    # one site
    (1, False, False): ("abc,bdef,lfk,cek->adl", 3),
    (1, True, False): ("abc,bdef,lfk,cegk->adgl", 3),
    # two site
    (2, False, False): ("abc,bdef,fghj,ljk,cehk->adgl", 4),
    (2, True, False): ("abc,bdef,fghj,ljk,cemhnk->admgnl", 4),
    # two-layer (H-w)^2 variants used by interior-eigenvalue DMRG and CV
    (1, False, True): ("abcd,befg,cfhi,jgik,aej->dhk", 4),
    (2, False, True): ("abcd,befg,cfhi,gjkl,ikmn,olnp,aejo->dhmp", 6),
}


def hop_spec(ltensor, rtensor, cmo, cshape, twolayer: bool = False):
    """Return ``(formula, operands)`` such that
    ``einsum(formula, *operands, c) == H_eff @ c``.  Used by the fused
    solver factories (``lib/solvers.expm_krylov_fused`` / ``davidson_fused``)
    which cache one jitted computation per (formula, shape)."""
    nsite = len(cmo)
    ancilla = 2 * nsite + 2 == len(cshape)
    ltensor = jnp.asarray(ltensor)
    rtensor = jnp.asarray(rtensor)
    cmo = [jnp.asarray(m) for m in cmo]
    if twolayer:
        assert nsite in (1, 2) and not ancilla
        formula, _ = _HOP_FORMULAS[(nsite, False, True)]
        if nsite == 1:
            return formula, (ltensor, cmo[0], cmo[0], rtensor)
        return formula, (ltensor, cmo[0], cmo[0], cmo[1], cmo[1], rtensor)
    formula, _ = _HOP_FORMULAS[(nsite, ancilla if nsite else False, False)]
    if nsite == 0:
        return formula, (ltensor, rtensor)
    if nsite == 1:
        return formula, (ltensor, cmo[0], rtensor)
    return formula, (ltensor, cmo[0], cmo[1], rtensor)


def hop_expr(ltensor, rtensor, cmo, cshape, twolayer: bool = False):
    """Build the effective-H matvec closure for the given environments and
    center-site MPO tensors.  ``cshape`` disambiguates the ancilla case."""
    nsite = len(cmo)
    ancilla = 2 * nsite + 2 == len(cshape)
    if not ancilla and nsite > 0:
        assert nsite + 2 == len(cshape)

    ltensor = jnp.asarray(ltensor)
    rtensor = jnp.asarray(rtensor)
    cmo = [jnp.asarray(m) for m in cmo]

    if twolayer:
        assert nsite in (1, 2) and not ancilla
        formula, _ = _HOP_FORMULAS[(nsite, False, True)]
        if nsite == 1:
            operands = (ltensor, cmo[0], cmo[0], rtensor)
        else:
            operands = (ltensor, cmo[0], cmo[0], cmo[1], cmo[1], rtensor)
        # route through einsum() so mixed real/complex operand lists are
        # dtype-unified outside the jitted graph (tunneled-TPU compiler bug)
        return lambda c: einsum(formula, *operands, c)

    formula, _ = _HOP_FORMULAS[(nsite, ancilla if nsite else False, False)]
    if nsite == 0:
        operands = (ltensor, rtensor)
    elif nsite == 1:
        operands = (ltensor, cmo[0], rtensor)
    else:
        operands = (ltensor, cmo[0], cmo[1], rtensor)
    return lambda c: einsum(formula, *operands, c)


# --- effective-H diagonals for preconditioning ----------------------------

def hop_diag(ltensor, rtensor, cmo, twolayer: bool = False):
    """Diagonal of the effective Hamiltonian
    (reference ``mps/gs.py:422-469``)."""
    ltensor = jnp.asarray(ltensor)
    rtensor = jnp.asarray(rtensor)
    cmo = [jnp.asarray(m) for m in cmo]
    nsite = len(cmo)
    if not twolayer:
        ldiag = einsum("aba->ba", ltensor)
        rdiag = einsum("aba->ba", rtensor)
        cdiags = [einsum("abbc->abc", m) for m in cmo]
        if nsite == 1:
            return einsum("ba,bcg,gf->acf", ldiag, cdiags[0], rdiag)
        return einsum("ba,bce,edg,gf->acdf", ldiag, cdiags[0], cdiags[1], rdiag)
    if nsite == 1:
        return einsum("abca,bdef,cedg,hfgh->adh", ltensor, cmo[0], cmo[0], rtensor)
    return einsum(
        "abca,bdef,cedg,fhij,gihk,ljkl->adhl",
        ltensor, cmo[0], cmo[0], cmo[1], cmo[1], rtensor,
    )


def hop_dense(ltensor, rtensor, cmo, twolayer: bool = False):
    """Materialize the dense effective Hamiltonian (for small local problems,
    reference ``mps/gs.py:307-369``)."""
    ltensor = jnp.asarray(ltensor)
    rtensor = jnp.asarray(rtensor)
    cmo = [jnp.asarray(m) for m in cmo]
    nsite = len(cmo)
    if not twolayer:
        if nsite == 1:
            return einsum("abc,bdef,lfk->adlcek", ltensor, cmo[0], rtensor)
        return einsum("abc,bdef,fghj,ljk->adglcehk", ltensor, cmo[0], cmo[1], rtensor)
    if nsite == 1:
        return einsum("abcd,befg,cfhi,jgik->aejdhk", ltensor, cmo[0], cmo[0], rtensor)
    return einsum(
        "abcd,befg,cfhi,gjkl,ikmn,olnp->aejodhmp",
        ltensor, cmo[0], cmo[0], cmo[1], cmo[1], rtensor,
    )


# --- interleaved einsum over hashable index labels ------------------------
# used by the tree tensor network engine where indices are identified by
# (tree, parent-dofs, child-dofs) tuples rather than positional letters

def interleaved_formula(*args):
    """Map ``(t0, idx0, t1, idx1, ..., out_idx)`` label lists to a standard
    einsum ``(formula, tensors)`` pair without contracting.  Lets callers
    (e.g. the bond-tensor-parallel tree hop) inspect or shard the formula."""
    import opt_einsum

    assert len(args) % 2 == 1
    *pairs, out_indices = args
    tensors = [jnp.asarray(t) for t in pairs[0::2]]
    index_lists = pairs[1::2]
    label_map = {}

    def to_symbols(labels):
        out = []
        for lab in labels:
            if lab not in label_map:
                label_map[lab] = opt_einsum.get_symbol(len(label_map))
            out.append(label_map[lab])
        return "".join(out)

    lhs = ",".join(to_symbols(labels) for labels in index_lists)
    rhs = to_symbols(out_indices)
    return lhs + "->" + rhs, tensors


def einsum_interleaved(*args):
    """``einsum_interleaved(t0, idx0, t1, idx1, ..., out_idx)`` where each
    ``idx`` is a sequence of hashable labels.  Labels are mapped to einsum
    symbols and the contraction runs through the jitted einsum cache."""
    formula, tensors = interleaved_formula(*args)
    return einsum(formula, *tensors)


# --- fused chain overlap ---------------------------------------------------

@lru_cache(maxsize=None)
def _chain_overlap_jit(n: int, ndim: int, conj_first: bool):
    """One jitted computation for the full transfer-matrix chain
    ``<mts1 (*)| mts2>``: a TDVP step computes the state norm after every
    evolve, and the per-site dispatch chain (2 ops x N sites, each ~1ms on
    the relay) dominated the step wall time.  jit keys on shapes/dtypes,
    so one executable per (chain shape, dtype) pair."""
    contract = {3: "abc,abd->dc", 4: "abcd,abce->ed"}[ndim]

    @jax.jit
    def run(*tensors):
        mts1, mts2 = tensors[:n], tensors[n:]
        e0 = jnp.eye(1, 1, dtype=jnp.result_type(*[t.dtype for t in tensors]))
        for mt1, mt2 in zip(mts1, mts2):
            e0 = jnp.tensordot(e0, mt2, axes=1)
            e0 = jnp.einsum(contract, e0, mt1.conj() if conj_first else mt1)
        return e0[0, 0]

    return run


def chain_overlap_device(mts1, mts2, conj_first: bool = False):
    """Device-scalar transfer-matrix chain (no host fetch)."""
    mts1 = [safe_asarray(t) for t in mts1]
    mts2 = [safe_asarray(t) for t in mts2]
    assert len(mts1) == len(mts2) and len({t.ndim for t in mts1}) == 1
    fn = _chain_overlap_jit(len(mts1), mts1[0].ndim, conj_first)
    return fn(*mts1, *mts2)


def chain_overlap(mts1, mts2, conj_first: bool = False) -> complex:
    """``sum_i <mts1_i (conj) | mts2_i>`` transfer-matrix chain in ONE
    device dispatch + one scalar fetch."""
    return complex(asnumpy(chain_overlap_device(mts1, mts2, conj_first)))


@lru_cache(maxsize=None)
def _rsqrt_scale_jit(ndim: int):
    @jax.jit
    def run(x, norm2):
        return x * jax.lax.rsqrt(jnp.maximum(
            jnp.real(norm2), jnp.finfo(jnp.real(norm2).dtype).tiny))

    return run


def normalize_chain_device(mts, qnidx: int):
    """Fetch-free state normalization: compute ||psi||^2 on device and
    scale the canonical-center tensor by its rsqrt — zero host syncs (the
    per-step norm fetch was 0.11 s of a 0.20 s TDVP step over the relay).
    Returns the new center tensor."""
    norm2 = chain_overlap_device(mts, mts, conj_first=True)
    return _rsqrt_scale_jit(mts[qnidx].ndim)(safe_asarray(mts[qnidx]), norm2)


# --- misc jitted helpers --------------------------------------------------

@jax.jit
def _tensordot1(a, b):
    return jnp.tensordot(a, b, axes=1)


def tensordot1(a, b):
    """a . b over one axis (the bond-merge workhorse)."""
    a, b = _harmonize_devices([safe_asarray(a), safe_asarray(b)])
    if a.dtype.kind == "c" or b.dtype.kind == "c":
        from renormalizer_tpu.lib.split_complex import split_complex_enabled

        if split_complex_enabled():
            # route through the split-lowering einsum (complex dot_general
            # is UNIMPLEMENTED on the tunneled TPU)
            import string

            la = string.ascii_lowercase[: a.ndim]
            lb = la[-1] + string.ascii_uppercase[: b.ndim - 1]
            return einsum(f"{la},{lb}->{la[:-1]}{lb[1:]}", a, b)
    return _tensordot1(a, b)


def asnumpy(x):
    """Device->host fetch that survives the axon relay's missing complex
    transfer support: complex device arrays are split into real/imag ON
    DEVICE and fetched as two real transfers (the relay raises
    UNIMPLEMENTED on a complex D2H copy)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    if (isinstance(x, jax.Array)
            and jnp.issubdtype(x.dtype, jnp.complexfloating)
            and jax.default_backend() != "cpu"):
        re, im = _split_fetch(x.shape, str(x.dtype))(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


@lru_cache(maxsize=None)
def _split_fetch(shape, dtype_name):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        return jnp.real(x), jnp.imag(x)

    return run
