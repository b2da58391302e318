"""Numeric parity against the reference's COMMITTED std data files.

Everything else in the suite re-derives its oracles (dense expm, qutip-free
kron Hamiltonians); these tests instead load arrays shipped inside the
reference repository itself and assert the rebuild reproduces them — the
strongest cross-implementation check available (SURVEY §4: "add … numeric
parity tests against the reference's committed std data").

Vendored artifacts (binary copies of the reference's files):

* ``tests/data/abs_zt.npy`` <- ``renormalizer/cv/tests/abs_zt.npy``
  zero-T DDMRG absorption of the 3-mol Holstein fixture over
  ``np.arange(0.05, 0.11, 5e-5)`` (protocol: ``cv/tests/test_abs.py:19-30``)
* ``tests/data/emi_zt.npy`` <- ``renormalizer/cv/tests/emi_zt.npy``
  zero-T DDMRG emission over ``np.arange(-0.11, -0.05, 5e-5)``
  (protocol: ``cv/tests/test_emi.py:16-28``)
"""

import os

import numpy as np
import pytest

from fixtures import holstein_model

from renormalizer_tpu.cv import SpectraZtCV, batch_run

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


@pytest.mark.parametrize("method", ("1site", "2site"))
def test_zt_abs_vs_reference_std(method):
    std = np.load(os.path.join(DATA, "abs_zt.npy"))
    freqs = np.arange(0.05, 0.11, 5.0e-5).tolist()
    picks = [300, 680, 800, 900]
    expected = [float(std[i][0][0]) for i in picks]
    cv = SpectraZtCV(holstein_model, "abs", 10, 5.0e-5, method=method,
                     rtol=1e-3)
    got = batch_run([freqs[i] for i in picks], 2, cv)
    assert np.allclose(got, expected, rtol=1e-2)


@pytest.mark.fast
def test_load_reference_npz(tmp_path):
    """Serialization parity (A.5): an MPS dumped by the REFERENCE package
    must load into the rebuild with identical dense wavefunction."""
    import subprocess
    import sys

    fname = str(tmp_path / "ref_mps.npz")
    # dump with the reference in a subprocess (the two packages share the
    # top-level module name `renormalizer` logging config otherwise)
    code = (
        "import sys; sys.path.insert(0, '/root/reference')\n"
        "from renormalizer.tests.parameter import holstein_model\n"
        "from renormalizer.mps import Mps\n"
        "mps = Mps.random(holstein_model, 1, 8)\n"
        f"mps.dump({fname!r})\n"
        "import numpy as np\n"
        f"np.save({str(tmp_path / 'dense.npy')!r}, mps.todense())\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True)
    if proc.returncode != 0:
        pytest.skip(f"reference unavailable: {proc.stderr[-200:]}")
    from renormalizer_tpu.mps import Mps

    mps = Mps.load(holstein_model, fname)
    dense_ref = np.load(str(tmp_path / "dense.npy"))
    assert np.allclose(np.asarray(mps.todense()), dense_ref, atol=1e-10)


def test_zt_emi_vs_reference_std():
    std = np.load(os.path.join(DATA, "emi_zt.npy"))
    freqs = np.arange(-0.11, -0.05, 5.0e-5).tolist()
    picks = [520, 529, 661]
    expected = np.asarray(std[picks], dtype=float).reshape(-1)
    cv = SpectraZtCV(holstein_model, "emi", 10, 5.0e-5, rtol=1e-3)
    got = np.asarray(batch_run([freqs[i] for i in picks], 1, cv)).reshape(-1)
    assert np.allclose(got, expected, rtol=1e-2)
