"""renormalizer_tpu — a TPU-native tensor-network package for electron-phonon
quantum dynamics (DMRG / TD-DMRG on MPS/MPO), built on JAX/XLA/Pallas.

Public API mirrors shuaigroup/Renormalizer
(reference ``renormalizer/__init__.py:39-53``).
"""

import os

# limit host BLAS threads: the heavy lifting happens on the TPU and
# oversubscribed host BLAS slows down the tiny host-side linear algebra
if "RENO_NUM_THREADS" in os.environ:
    _n = os.environ["RENO_NUM_THREADS"]
    for _v in ("MKL_NUM_THREADS", "OMP_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(_v, _n)

from renormalizer_tpu.backend import backend
from renormalizer_tpu.utils import log

from renormalizer_tpu.model import (
    Model,
    HolsteinModel,
    SpinBosonModel,
    TI1DModel,
    Op,
    OpSum,
    BasisSHO,
    BasisHopsBoson,
    BasisSineDVR,
    BasisMultiElectron,
    BasisMultiElectronVac,
    BasisSimpleElectron,
    BasisHalfSpin,
    BasisDummy,
    Mol,
    Phonon,
)
from renormalizer_tpu.utils import (
    Quantity,
    CompressCriteria,
    CompressConfig,
    OptimizeConfig,
    EvolveConfig,
    EvolveMethod,
)
from renormalizer_tpu.mps import Mps, Mpo, MpDm, ThermalProp, optimize_mps

__version__ = "0.1.0"
