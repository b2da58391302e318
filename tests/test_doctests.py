"""Docstring examples run as tests (reference ``pytest.ini:1-3`` runs its
doctests suite-wide; here the modules that carry examples are enumerated so
the doctest tier stays deliberate)."""

import doctest

import pytest

import renormalizer_tpu.lib.split_complex
import renormalizer_tpu.model.basis
import renormalizer_tpu.model.op
import renormalizer_tpu.utils.quantity


@pytest.mark.parametrize(
    "module",
    [
        renormalizer_tpu.model.op,
        renormalizer_tpu.model.basis,
        renormalizer_tpu.utils.quantity,
        renormalizer_tpu.lib.split_complex,
    ],
    ids=lambda m: m.__name__,
)
def test_doctests(module):
    result = doctest.testmod(module, verbose=False)
    assert result.attempted > 0, f"{module.__name__} has no doctest examples"
    assert result.failed == 0
