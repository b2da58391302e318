"""Config-object field contracts (SURVEY A.3; reference
``utils/configs.py:128-416``)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from renormalizer_tpu.utils import (
    CompressConfig,
    CompressCriteria,
    EvolveConfig,
    EvolveMethod,
    OptimizeConfig,
    Quantity,
)
from renormalizer_tpu.utils.rk import RungeKutta


def test_threshold_validation():
    cc = CompressConfig()
    with pytest.raises(ValueError):
        cc.threshold = 0
    with pytest.raises(ValueError):
        cc.threshold = -1e-3
    with pytest.raises(ValueError):
        cc.threshold = 1  # ambiguous, rejected like the reference
    with pytest.raises(ValueError):
        cc.threshold = 2.0
    cc.threshold = 0.5


def test_compute_m_trunc_semantics():
    sigma = np.array([1.0, 0.5, 1e-2, 1e-5, 1e-9])
    cc = CompressConfig(threshold=1e-3)
    assert cc.compute_m_trunc(sigma, 0, True) == 3  # normalized > threshold
    cf = CompressConfig(CompressCriteria.fixed, max_bonddim=2)
    cf.set_bonddim(4)
    assert cf.compute_m_trunc(sigma, 0, True) == 2
    cb = CompressConfig(CompressCriteria.both, threshold=1e-3, max_bonddim=2)
    cb.set_bonddim(4)
    assert cb.compute_m_trunc(sigma, 0, True) == 2


def test_update_keeps_stricter():
    a = CompressConfig(threshold=1e-3)
    b = CompressConfig(threshold=1e-5)
    a.update(b)
    assert a.threshold == 1e-5
    with pytest.raises(ValueError):
        a.update(CompressConfig(CompressCriteria.fixed))


def test_relax_loosens():
    a = CompressConfig(threshold=1e-6)
    a.relax()
    assert a.threshold == pytest.approx(3e-6)


def test_optimize_config_defaults():
    oc = OptimizeConfig()
    assert oc.procedure == [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
    assert oc.inverse == 1.0


def test_evolve_config_defaults_and_dt_check():
    ec = EvolveConfig()
    assert ec.method is EvolveMethod.prop_and_compress
    assert ec.guess_dt == pytest.approx(1e-1) or ec.guess_dt is None
    assert ec.reg_epsilon == pytest.approx(1e-10)
    assert ec.ivp_rtol == pytest.approx(1e-5)
    assert ec.ivp_atol == pytest.approx(1e-8)


def test_rk_tableaus():
    # the reference's supported embedded/regular tableaus (utils/rk.py:15-26)
    for name in ["Forward_Euler", "midpoint_RK2", "Heun_RK2", "Ralston_RK2",
                 "Kutta_RK3", "C_RK4", "38rule_RK4", "Fehlberg5", "RKF45",
                 "Cash-Karp45"]:
        rk = RungeKutta(name)
        assert rk.order[0] >= 1


def test_quantity_conversions():
    assert Quantity(1, "eV").as_au() == pytest.approx(0.0367493, rel=1e-4)
    assert Quantity(8065.54, "cm-1").as_au() == pytest.approx(
        Quantity(1, "eV").as_au(), rel=1e-4
    )
    beta = Quantity(298, "K").to_beta()
    assert beta == pytest.approx(1059.65, rel=1e-3)  # 1/(kB * 298 K) in a.u.
