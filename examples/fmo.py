"""FMO (Fenna-Matthews-Olson) exciton energy transfer dynamics.

Seven bacteriochlorophyll sites with the Adolphs & Renger (Biophys. J. 2006)
site energies / couplings; each site couples to a Debye bath
(lambda = 35 cm-1, omega_c = 106.1 cm-1) discretized into a few effective
modes with equal per-mode reorganization energy.  Real-time TD-DMRG tracks
the exciton arriving at site 3 from the initial site-1 excitation.
Counterpart of reference ``example/fmo.py`` (which loads the same physics
from ``fmo_sdf.json``).
"""

import logging

import numpy as np

from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
from renormalizer_tpu.transport.dynamics import ChargeDiffusionDynamics, InitElectron
from renormalizer_tpu.utils import CompressConfig, EvolveConfig, Quantity

logging.basicConfig(level=logging.INFO)

# Adolphs & Renger 2006 FMO Hamiltonian, cm-1 (upper triangle; symmetric)
SITE_E = np.array([12410.0, 12530, 12210, 12320, 12480, 12630, 12440])
J = np.array([
    [0.0, -87.7, 5.5, -5.9, 6.7, -13.7, -9.9],
    [-87.7, 0.0, 30.8, 8.2, 0.7, 11.8, 4.3],
    [5.5, 30.8, 0.0, -53.5, -2.2, -9.6, 6.0],
    [-5.9, 8.2, -53.5, 0.0, -70.7, -17.0, -63.3],
    [6.7, 0.7, -2.2, -70.7, 0.0, 81.1, -1.3],
    [-13.7, 11.8, -9.6, -17.0, 81.1, 0.0, 39.7],
    [-9.9, 4.3, 6.0, -63.3, 39.7, 0.0, -2.0],
])
LAMBDA_CM = 35.0
OMEGA_C_CM = 106.1
NMODES = 3          # effective Debye modes per site
NLEVELS = 4

# the FC initial condition excites the CENTRAL site of the chain layout, so
# permute the BChl labels to place site 1 there (positions -> BChl index)
PERM = np.array([1, 2, 3, 0, 4, 5, 6])
SITE_E = SITE_E[PERM]
J = J[np.ix_(PERM, PERM)]

# equal-reorganization Debye discretization:
# omega_j = omega_c * tan(pi/2 * (j - 1/2)/n), each carrying lambda/n
j_idx = np.arange(1, NMODES + 1)
omegas_cm = OMEGA_C_CM * np.tan(np.pi / 2 * (j_idx - 0.5) / NMODES)
lam_per_mode = Quantity(LAMBDA_CM / NMODES, "cm-1")

mols = []
e_min = SITE_E.min()
for i in range(7):
    ph_list = [
        Phonon.simplest_phonon(
            Quantity(w, "cm-1"), lam_per_mode, lam=True, max_pdim=NLEVELS
        )
        for w in omegas_cm
    ]
    mols.append(Mol(Quantity(SITE_E[i] - e_min, "cm-1"), ph_list))

j_matrix = np.array([[Quantity(v, "cm-1").as_au() for v in row] for row in J])
model = HolsteinModel(mols, j_matrix, scheme=3)

compress = CompressConfig(threshold=1e-4)
evolve = EvolveConfig(adaptive=True, guess_dt=1.0)
job = ChargeDiffusionDynamics(
    model, init_electron=InitElectron.fc, stop_at_edge=False,
    compress_config=compress, evolve_config=evolve,
)
# ~5 fs of exciton dynamics (1 a.u. = 0.0242 fs)
job.evolve(evolve_dt=100.0, nsteps=10)
occ = np.array(job.e_occupations_array)
print("BChl occupations over time (rows = steps, cols = BChl 1..7):")
print(np.round(occ[:, np.argsort(PERM)], 3))
print("final BChl-2 population:", round(float(occ[-1, np.argsort(PERM)[1]]), 4))
