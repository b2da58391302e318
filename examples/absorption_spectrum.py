"""Zero-temperature absorption spectrum two ways: time-domain autocorrelation
and frequency-domain DDMRG correction vector.

Run: python examples/absorption_spectrum.py
"""
import numpy as np

from renormalizer_tpu import HolsteinModel, Mol, Phonon, Quantity
from renormalizer_tpu.cv import SpectraZtCV
from renormalizer_tpu.spectra import SpectraTwoWayPropZeroT

ph = Phonon.simple_phonon(Quantity(0.01), Quantity(0.3), 4)
model = HolsteinModel([Mol(Quantity(0.1), [ph], 1.0)] * 3, Quantity(-0.02))

# time domain: propagate mu|0> and Fourier-transform the autocorrelation
job = SpectraTwoWayPropZeroT(model, "abs")
job.evolve(evolve_dt=2.0, nsteps=50)
print("autocorrelation samples:", np.asarray(job.autocorr)[:5])

# frequency domain: solve ((H-E0-w)^2 + eta^2)|x> = -eta mu|0> per w
cv = SpectraZtCV(model, "abs", m_max=16, eta=0.02)
freqs = np.linspace(0.08, 0.16, 5)
spectrum = [cv.cv_solve(w) for w in freqs]
print("DDMRG response:", spectrum)
