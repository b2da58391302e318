"""batch_run: in-process device-parallel frequency sweeps.

Checks the round-robin interleaved workers (one per virtual CPU device)
produce responses identical to the serial loop — the reference's
``multiprocessing.Pool`` (``cv/spectra_cv.py:17-50``) is replaced without
changing numerics.
"""

import numpy as np

from renormalizer_tpu.cv import SpectraZtCV
from renormalizer_tpu.cv.spectra_cv import batch_run
from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
from renormalizer_tpu.utils import Quantity


def _make_cv():
    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(0.4), 2)
    model = HolsteinModel([Mol(Quantity(1.0), [ph], 1.0)] * 2, Quantity(0.2))
    return SpectraZtCV(
        model, "abs", m_max=16, eta=0.05,
        procedure_cv=[0.4, 0.2, 0.1, 0] + [0] * 10,
    )


def test_batch_run_matches_serial():
    freqs = [1.0, 1.05, 1.45, 1.5]

    cv = _make_cv()
    serial = [cv.cv_solve(w) for w in freqs]

    cv2 = _make_cv()
    # same GS/b_mps/cv_mps init as cv (deterministic seeds); 4 workers over
    # the virtual 8-device CPU mesh
    batched = batch_run(freqs, 4, cv2)

    # contiguous chunking changes the warm start (each worker starts from the
    # initial guess instead of the previous frequency's solution), so demand
    # convergence-level agreement rather than bitwise equality
    np.testing.assert_allclose(batched, serial, rtol=1e-4)


def test_batch_run_single_worker_identical():
    freqs = [1.05, 1.5]

    cv = _make_cv()
    serial = [cv.cv_solve(w) for w in freqs]

    cv2 = _make_cv()
    batched = batch_run(freqs, 1, cv2)
    np.testing.assert_allclose(batched, serial, rtol=1e-12)
