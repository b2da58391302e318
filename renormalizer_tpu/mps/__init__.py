from renormalizer_tpu.mps.mps import Mps, BraKetPair
from renormalizer_tpu.mps.mpo import Mpo, StackedMpo
from renormalizer_tpu.mps.mpdm import MpDm
from renormalizer_tpu.mps.thermalprop import ThermalProp, load_thermal_state
from renormalizer_tpu.mps.gs import optimize_mps, DmrgFCISolver
from renormalizer_tpu.mps.tda import TDA
from renormalizer_tpu.mps import gs
