"""Run docstring examples as tests (reference parity: the reference's
pytest.ini collects doctests suite-wide, /root/reference/pytest.ini:1-3).

The driver invokes ``pytest tests/``, which would not collect
``--doctest-modules`` over the package directory, so the doctest-bearing
modules are enumerated here explicitly.  Add new modules to DOCTEST_MODULES
when they gain ``>>>`` examples.
"""

import doctest
import importlib

import pytest

DOCTEST_MODULES = [
    "renormalizer_tpu.model.op",
    "renormalizer_tpu.model.basis",
    "renormalizer_tpu.utils.quantity",
    "renormalizer_tpu.lib.split_complex",
]


@pytest.mark.parametrize("modname", DOCTEST_MODULES)
def test_doctests(modname):
    mod = importlib.import_module(modname)
    results = doctest.testmod(mod, verbose=False, optionflags=doctest.ELLIPSIS)
    assert results.attempted > 0, f"{modname} lost its doctest examples"
    assert results.failed == 0
