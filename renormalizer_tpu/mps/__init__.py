# populated as the MPS engine is built up
try:
    from renormalizer_tpu.mps.mps import Mps
    from renormalizer_tpu.mps.mpo import Mpo, StackedMpo
    from renormalizer_tpu.mps.mpdm import MpDm
    from renormalizer_tpu.mps.thermalprop import ThermalProp
    from renormalizer_tpu.mps.gs import optimize_mps, DmrgFCISolver
    from renormalizer_tpu.mps.mps import BraKetPair
except ImportError:  # pragma: no cover - during bootstrap
    Mps = Mpo = MpDm = ThermalProp = optimize_mps = None
