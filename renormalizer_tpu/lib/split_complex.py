r"""Split-complex (real/imaginary-pair) evolution kernels.

Real-time dynamics propagates complex-valued local tensors with
``exp(-i dt H_eff)`` (reference ``renormalizer/mps/mps.py:1267-1404`` runs
complex128 on its accelerator, ``renormalizer/mps/backend.py:150-160``).
On some TPU execution paths complex XLA types are unreliable — the tunneled
device used here intermittently rejects complex kernels (round-2 bench died
in ``shape_util.cc`` compiling a mixed real/complex einsum).  These kernels
express the *entire* local propagation in real arithmetic so that no complex
dtype ever reaches the compiler:

* a complex tensor ``x`` travels as a real tensor with a leading component
  axis of size 2 (``x2[0] = Re x``, ``x2[1] = Im x``);
* every complex einsum *operand* travels as its real 2x2 matrix
  representation (``a + ib  <->  [[a, -b], [b, a]]``) along a pair of chain
  axes, so the multilinear effective-H product becomes a chain of 2x2 real
  matrix products ending in the length-2 component axis of the vector —
  one ordinary real einsum;
* the Lanczos recurrence (Hermitian H: real ``alpha``/``beta``), the
  tridiagonal eigensolve, and the ``exp((dtr + i*dti) * w)`` combination are
  written out in real arithmetic.

Cost: the chained 2x2 representation does at most 2x the real FLOPs of a
native complex einsum — acceptable insurance for a path that otherwise
cannot run at all.  Enable with ``RENO_SPLIT_COMPLEX=1`` (auto-fallback is
wired in ``lib.solvers.expm_krylov_fused``).
"""

import os
import string
from functools import lru_cache
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def split_complex_enabled() -> bool:
    """``RENO_SPLIT_COMPLEX=1`` routes complex local propagations through
    the all-real kernels; ``0`` (or unset) uses native complex XLA types."""
    return os.environ.get("RENO_SPLIT_COMPLEX", "") == "1"


def split(x) -> jnp.ndarray:
    """Complex array -> real array with leading component axis of size 2."""
    from renormalizer_tpu.ops.contract import safe_asarray

    x = safe_asarray(x)
    return jnp.stack([x.real.astype(_real_of(x.dtype)),
                      x.imag.astype(_real_of(x.dtype))])


def unsplit(x2):
    """Inverse of :func:`split` (produces a complex device array)."""
    return jax.lax.complex(x2[0], x2[1])


def _real_of(dtype):
    return jnp.finfo(dtype).dtype if jnp.issubdtype(dtype, jnp.complexfloating) \
        else jnp.dtype(dtype)


def mat2(x) -> jnp.ndarray:
    """Complex operand -> its real 2x2 matrix representation, two leading
    axes ``(row, col)``: ``[[Re, -Im], [Im, Re]]``."""
    x = jnp.asarray(x)
    xr = x.real.astype(_real_of(x.dtype))
    xi = x.imag.astype(_real_of(x.dtype))
    return jnp.stack([jnp.stack([xr, -xi]), jnp.stack([xi, xr])])


def split_formula(formula: str, complex_flags: Tuple[bool, ...]) -> str:
    """Rewrite an effective-H einsum formula (vector LAST) for the split
    representation.

    ``complex_flags[k]`` says whether operand ``k`` (including the final
    vector) is complex.  Complex non-vector operands get a (row, col) chain
    axis pair; the complex vector gets the single trailing chain axis; the
    output keeps the leading component axis.  Real operands pass through
    untouched (a real scalar is a multiple of the identity in the 2x2
    representation, so it simply does not participate in the chain).

    >>> split_formula("abc,bdef,lfk,cek->adl", (True, False, True, True))
    'ghabc,bdef,hilfk,icek->gadl'
    """
    ins, out = formula.split("->")
    terms = ins.split(",")
    assert len(terms) == len(complex_flags)
    if not complex_flags[-1]:
        raise ValueError("the vector operand must be complex in split mode")
    used = set(formula) - {",", "-", ">"}
    fresh = iter(c for c in string.ascii_letters if c not in used)
    n_chain = sum(complex_flags[:-1])
    # chain letters: row of first complex operand .. col of last -> vector
    links = [next(fresh) for _ in range(n_chain + 1)]
    new_terms = []
    k = 0
    for term, is_c in zip(terms[:-1], complex_flags[:-1]):
        if is_c:
            new_terms.append(links[k] + links[k + 1] + term)
            k += 1
        else:
            new_terms.append(term)
    new_terms.append(links[-1] + terms[-1])
    return ",".join(new_terms) + "->" + links[0] + out


def _hop2(formula2, operands2, cshape2):
    """Flat split-representation matvec: (2*N,) -> (2*N,)."""

    def hop_flat(v2):
        c2 = v2.reshape(cshape2)
        return jnp.einsum(formula2, *operands2, c2, optimize="optimal").ravel()

    return hop_flat


def _lanczos_expm_split(hop2, dtr, dti, v0_2, m_max):
    """All-real Lanczos ``exp((dtr + i dti) H) v`` in the split layout.

    Mirrors ``lib.solvers._lanczos_expm`` step for step; ``v0_2`` is the
    flat ``(2, N)`` split vector.  Hermitian H => real ``alpha``/``beta``.
    """
    N = v0_2.shape[1]
    rdt = v0_2.dtype
    beta0 = jnp.linalg.norm(v0_2)

    def lanczos_step(carry, j):
        V, alpha, beta, vprev_beta = carry          # V: (m+1, 2, N)
        v = V[j]
        w = hop2(v.ravel()).reshape(2, N)
        a = jnp.sum(v * w)                           # Re<v, Hv>
        w = w - a * v - vprev_beta[1] * vprev_beta[0]
        # full reorthogonalization against every row of V (zero rows inert):
        #   p_j = <V_j, w> = (Vr.wr + Vi.wi) + i (Vr.wi - Vi.wr)
        pr = jnp.einsum("jpn,pn->j", V, w)
        pi = jnp.einsum("jn,n->j", V[:, 0], w[1]) - jnp.einsum(
            "jn,n->j", V[:, 1], w[0])
        wr = w[0] - pr @ V[:, 0] + pi @ V[:, 1]
        wi = w[1] - pr @ V[:, 1] - pi @ V[:, 0]
        w = jnp.stack([wr, wi])
        b = jnp.linalg.norm(w)
        vnext = jnp.where(b > 1e-14, w / b, jnp.zeros_like(w))
        V = V.at[j + 1].set(vnext)
        alpha = alpha.at[j].set(a)
        beta = beta.at[j].set(b)
        return (V, alpha, beta, (v, b)), None

    V = jnp.zeros((m_max + 1, 2, N), dtype=rdt).at[0].set(v0_2 / beta0)
    alpha = jnp.zeros(m_max, dtype=rdt)
    beta = jnp.zeros(m_max, dtype=rdt)
    (V, alpha, beta, _), _ = jax.lax.scan(
        lanczos_step,
        (V, alpha, beta, (jnp.zeros_like(v0_2), jnp.asarray(0.0, rdt))),
        jnp.arange(m_max),
    )

    T = (
        jnp.diag(alpha)
        + jnp.diag(beta[: m_max - 1], 1)
        + jnp.diag(beta[: m_max - 1], -1)
    )
    w_eig, u = jnp.linalg.eigh(T)
    # exp((dtr + i dti) w) split into real/imag coefficient vectors
    mag = jnp.exp(dtr * w_eig)
    er = mag * jnp.cos(dti * w_eig)
    ei = mag * jnp.sin(dti * w_eig)
    e1 = u[0, :]
    coef_r = (u * er[None, :]) @ e1
    coef_i = (u * ei[None, :]) @ e1
    Vr, Vi = V[:m_max, 0], V[:m_max, 1]
    out_r = coef_r @ Vr - coef_i @ Vi
    out_i = coef_r @ Vi + coef_i @ Vr
    return beta0 * jnp.stack([out_r, out_i])


@lru_cache(maxsize=None)
def _expm_split_factory(formula: str, cshape: Tuple[int, ...], max_m: int,
                        complex_flags: Tuple[bool, ...]):
    formula2 = split_formula(formula, complex_flags)
    cshape2 = (2,) + tuple(cshape)

    @jax.jit
    def fused(dtr, dti, c0_2, *operands2):
        hop2 = _hop2(formula2, operands2, cshape2)
        w2 = _lanczos_expm_split(hop2, dtr, dti, c0_2.reshape(2, -1), max_m)
        return w2.reshape(cshape2)

    return fused


def expm_krylov_split(formula, operands, dt, c0, max_m: int = 30):
    """Split-complex twin of ``solvers.expm_krylov_fused``: same signature,
    complex in / complex out, but the compiled computation is all-real.

    Real operands stay real (identity in the 2x2 representation); complex
    operands are converted on device with cheap elementwise kernels."""
    c0 = jnp.asarray(c0)
    if not jnp.issubdtype(c0.dtype, jnp.complexfloating):
        c0 = c0.astype(jnp.complex64 if c0.dtype == jnp.float32
                       else jnp.complex128)
    operands = [jnp.asarray(o) for o in operands]
    flags = tuple(
        [bool(jnp.issubdtype(o.dtype, jnp.complexfloating)) for o in operands]
        + [True]
    )
    ops2 = [mat2(o) if f else o for o, f in zip(operands, flags[:-1])]
    c0_2 = split(c0)
    m = int(min(max_m, c0.size))
    dt = complex(dt)
    rdt = c0_2.dtype
    fn = _expm_split_factory(formula, tuple(c0.shape), m, flags)
    out2 = fn(jnp.asarray(dt.real, rdt), jnp.asarray(dt.imag, rdt),
              c0_2, *ops2)
    return unsplit(out2)
