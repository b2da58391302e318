"""Content-hash shared-environment expectations (reference ``mps.py:2103-2169``).

Two independently constructed identical MPOs must share cached environments
(round 1 keyed on ``id(tensor)``, so they never did).
"""

import numpy as np
import pytest

from fixtures import holstein_model
from renormalizer_tpu.model import Op
from renormalizer_tpu.mps import Mpo, Mps


@pytest.mark.fast
def test_independent_identical_mpos_share_digests():
    mpo1 = Mpo(holstein_model, Op(r"a^\dagger a", 0))
    mpo2 = Mpo(holstein_model, Op(r"a^\dagger a", 0))
    assert all(h is not None for h in mpo1._mt_hashes)
    assert mpo1._mt_hashes == mpo2._mt_hashes
    # a different operator must NOT collide
    mpo3 = Mpo(holstein_model, Op(r"a^\dagger a", 1))
    assert mpo1._mt_hashes != mpo3._mt_hashes


def test_expectations_share_environments_across_instances():
    import renormalizer_tpu.ops.contract as contract_mod

    mps = Mps.random(holstein_model, 1, 10)
    ops = [Op(r"a^\dagger a", d) for d in holstein_model.e_dofs]
    mpos_a = [Mpo(holstein_model, op) for op in ops]
    mpos_b = [Mpo(holstein_model, op) for op in ops]

    counter = {"n": 0}
    orig = contract_mod.contract_one_site

    def counting(*args, **kwargs):
        counter["n"] += 1
        return orig(*args, **kwargs)

    import renormalizer_tpu.mps.mps as mps_mod

    old = mps_mod.contract_one_site
    try:
        mps_mod.contract_one_site = counting
        counter["n"] = 0
        ref = mps.expectations(mpos_a)
        n_first = counter["n"]
        counter["n"] = 0
        # duplicated list: identical content, different instances — shared
        # environments mean no extra contractions vs the single list
        both = mps.expectations(mpos_a + mpos_b)
        n_both = counter["n"]
    finally:
        mps_mod.contract_one_site = old

    np.testing.assert_allclose(both[: len(ops)], ref)
    np.testing.assert_allclose(both[len(ops):], ref)
    assert n_both <= n_first * 1.2 + len(ops)  # duplicates are ~free
    # parity with the unshared path
    plain = np.array([mps.expectation(m) for m in mpos_b])
    np.testing.assert_allclose(ref, plain, atol=1e-10)
