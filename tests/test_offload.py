"""HBM <-> host-RAM tiering (RENO_HOST_OFFLOAD; reference disk offload
``mp.py:1047-1080`` / host environments ``mps/lib.py:114-118``)."""

import numpy as np
import pytest

from fixtures import holstein_model, GS_E
from renormalizer_tpu.mps import Mpo, Mps, offload
from renormalizer_tpu.mps.gs import optimize_mps
from renormalizer_tpu.mps.lib import Environ


@pytest.fixture
def tiering(monkeypatch):
    monkeypatch.setenv("RENO_HOST_OFFLOAD", "2")
    offload.hot_window.cache_clear()
    yield
    offload.hot_window.cache_clear()


@pytest.mark.fast
def test_environ_tiered_store_roundtrip(tiering):
    mps = Mps.random(holstein_model, 1, 10)
    mpo = Mpo(holstein_model)
    environ = Environ(mps, mpo)
    store = environ._store
    assert isinstance(store, offload.TieredStore)
    # building both domains with a 2-entry hot window must have evicted
    assert store.n_evicted > 0
    # reads restore transparently and match a fresh untiered build
    environ2 = Environ.__new__(Environ)
    environ2._store = {}
    environ2.sentinel = environ.sentinel
    environ2._build(mps, mpo, None, None)
    for key in list(environ2._store):
        np.testing.assert_allclose(
            np.asarray(environ.read(*key)), np.asarray(environ2._store[key])
        )
    assert store.n_restored > 0


def test_dmrg_with_offload_matches_regression(tiering):
    mpo = Mpo(holstein_model)
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    # force site-tensor offload of everything beyond the window
    mps.compress_config.dump_matrix_size = 1
    mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    energies, opt = optimize_mps(mps.copy(), mpo)
    assert min(energies) == pytest.approx(GS_E, rel=1e-5)


def test_cold_site_transparent_restore(tiering):
    mps = Mps.random(holstein_model, 1, 10, percent=1.0)
    mps.compress_config.dump_matrix_size = 1
    mpo = Mpo(holstein_model)
    e_before = mps.expectation(mpo)
    mps._offload_cold_sites(0)
    assert len(mps._cold_sites) > 0
    # iteration/getitem restore transparently
    assert mps.expectation(mpo) == pytest.approx(e_before, rel=1e-12)
    assert len(mps._cold_sites) == 0


def test_tdvp_with_offload_matches(tiering):
    """Evolution with tiering active reproduces untiered dynamics."""
    from fixtures import exact_model
    from renormalizer_tpu.model import Op
    from renormalizer_tpu.utils import EvolveConfig, EvolveMethod

    model = exact_model()
    mpo = Mpo(model)

    def run():
        mps = Mps.hartree_product_state(model, {model.e_dofs[0]: 1})
        mps = mps.expand_bond_dimension(hint_mpo=mpo)
        mps.compress_config.dump_matrix_size = 1  # offload everything cold
        mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps)
        for _ in range(3):
            mps = mps.evolve(mpo, 0.2)
        return np.array(
            mps.expectations([Op(r"a^\dagger a", d) for d in model.e_dofs])
        )

    with_tiering = run()
    offload.hot_window.cache_clear()
    import os

    os.environ["RENO_HOST_OFFLOAD"] = "0"
    offload.hot_window.cache_clear()
    without = run()
    np.testing.assert_allclose(with_tiering, without, atol=1e-10)
