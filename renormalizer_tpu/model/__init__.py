from renormalizer_tpu.model.op import Op, OpSum
from renormalizer_tpu.model.basis import (
    BasisSet,
    BasisSHO,
    BasisHopsBoson,
    BasisSineDVR,
    BasisMultiElectron,
    BasisMultiElectronVac,
    BasisSimpleElectron,
    BasisHalfSpin,
    BasisDummy,
)
from renormalizer_tpu.model.phonon import Phonon
from renormalizer_tpu.model.mol import Mol
from renormalizer_tpu.model.model import (
    Model,
    HolsteinModel,
    SpinBosonModel,
    TI1DModel,
    construct_j_matrix,
    load_from_dict,
    heisenberg_ops,
)
from renormalizer_tpu.model import h_qc
