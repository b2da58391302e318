"""Split-complex (all-real) evolution kernels vs the native complex path.

VERDICT r2 item 3 / SURVEY §7 hard part 5: real-time dynamics must be able to
run without any complex XLA dtype reaching the device compiler (the tunneled
TPU intermittently rejects complex kernels).  These tests force
``RENO_SPLIT_COMPLEX=1`` on the CPU tier and require the split path to match
the native complex path to tight tolerances.
"""

import numpy as np
import pytest

from fixtures import dense_hamiltonian, exact_model

from renormalizer_tpu import (
    EvolveConfig,
    EvolveMethod,
    Mpo,
    Mps,
    Quantity,
)
from renormalizer_tpu.lib.split_complex import (
    expm_krylov_split,
    split_formula,
)
from renormalizer_tpu.lib.solvers import expm_krylov_fused
from renormalizer_tpu.ops.contract import hop_spec


@pytest.mark.fast
def test_split_formula():
    assert (
        split_formula("abc,bdef,lfk,cek->adl", (True, False, True, True))
        == "ghabc,bdef,hilfk,icek->gadl"
    )
    # bond-tensor (zero-site) formula: both environments complex
    assert (
        split_formula("abc,lbk,ck->al", (True, True, True))
        == "deabc,eflbk,fck->dal"
    )
    # all operands real except the vector: only the component axis threads
    assert (
        split_formula("abc,bdef,lfk,cek->adl", (False, False, False, True))
        == "abc,bdef,lfk,gcek->gadl"
    )
    with pytest.raises(ValueError):
        split_formula("abc,ck->a", (True, False))


def _random_hermitian_hop(rng, M, w, d, complex_env):
    """Random effective-H operands (L, W, R) with the Hermitian symmetry the
    one-site hop formula implies: L[a,b,c]=conj(L[c,b,a]),
    W[b,d,e,f]=conj(W[b,e,d,f]), R[l,f,k]=conj(R[k,f,l])."""
    def herm3(x):
        return x + x.conj().transpose(2, 1, 0)

    def arr(*s):
        if complex_env:
            return rng.standard_normal(s) + 1j * rng.standard_normal(s)
        return rng.standard_normal(s)

    L = herm3(arr(M, w, M))
    R = herm3(arr(M, w, M))
    W = rng.standard_normal((w, d, d, w))
    W = W + W.transpose(0, 2, 1, 3)  # real symmetric in the physical pair
    return L, W, R


@pytest.mark.parametrize("complex_env", [False, True])
def test_expm_split_matches_complex(complex_env):
    rng = np.random.default_rng(7)
    M, w, d = 6, 3, 4
    L, W, R = _random_hermitian_hop(rng, M, w, d, complex_env)
    c0 = rng.standard_normal((M, d, M)) + 1j * rng.standard_normal((M, d, M))
    formula, operands = hop_spec(L, R, [W], c0.shape)
    dt = -0.13j
    ref = np.asarray(expm_krylov_fused(formula, operands, dt, c0))
    out = np.asarray(expm_krylov_split(formula, operands, dt, c0))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)


def test_expm_split_imaginary_time():
    # dt real (imaginary-time flavoring through the split kernel)
    rng = np.random.default_rng(3)
    M, w, d = 5, 2, 3
    L, W, R = _random_hermitian_hop(rng, M, w, d, True)
    c0 = rng.standard_normal((M, d, M)) + 1j * rng.standard_normal((M, d, M))
    formula, operands = hop_spec(L, R, [W], c0.shape)
    ref = np.asarray(expm_krylov_fused(formula, operands, -0.2, c0))
    out = np.asarray(expm_krylov_split(formula, operands, -0.2, c0))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)


def test_tdvp_ps_split_complex_end_to_end(monkeypatch):
    """Full TDVP-PS dynamics with RENO_SPLIT_COMPLEX=1 must match the native
    complex path step for step (electronic occupations, 10 steps)."""
    model = exact_model()
    tentative_mpo = Mpo(model)
    from renormalizer_tpu import Op
    from renormalizer_tpu.model import Model

    init = Mpo.onsite(model, r"a^\dagger", dof_set=[0]) @ Mps.ground_state(
        model, False
    )
    init = init.expand_bond_dimension(hint_mpo=tentative_mpo)
    e = init.expectation(tentative_mpo)
    mpo = Mpo(model, offset=Quantity(e))
    occ_mpos = [Mpo(Model(model.basis, [Op(r"a^\dagger a", dof)]))
                for dof in model.e_dofs]

    def run(split):
        if split:
            monkeypatch.setenv("RENO_SPLIT_COMPLEX", "1")
        else:
            monkeypatch.delenv("RENO_SPLIT_COMPLEX", raising=False)
        mps = init.copy()
        mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps, adaptive=False)
        occs = []
        for _ in range(10):
            mps = mps.evolve(mpo, 0.2)
            occs.append([mps.expectation(o) for o in occ_mpos])
        return np.array(occs)

    ref = run(split=False)
    out = run(split=True)
    np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-9)
