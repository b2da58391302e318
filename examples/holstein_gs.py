"""Ground state of a Holstein polaron chain with 2-site DMRG.

Run: python examples/holstein_gs.py
"""
import numpy as np

from renormalizer_tpu import HolsteinModel, Mol, Mpo, Mps, Phonon, Quantity
from renormalizer_tpu.mps.gs import optimize_mps
from renormalizer_tpu.utils import OptimizeConfig

nmols = 5
ph = Phonon.simple_phonon(Quantity(1400, "cm-1"), Quantity(17.0), 4)
model = HolsteinModel(
    [Mol(Quantity(2.3, "eV"), [ph])] * nmols, Quantity(-0.12, "eV")
)

mps = Mps.random(model, 1, 32, percent=1.0)
mps.optimize_config = OptimizeConfig(
    procedure=[[16, 0.4], [32, 0.2], [32, 0.1], [32, 0], [32, 0]]
)
energies, ground = optimize_mps(mps, Mpo(model))
print("sweep energies:", [float(np.min(np.asarray(e))) for e in energies])
print("electron occupations:", ground.e_occupations)
