from renormalizer_tpu.vibration.vscf import Vscf
