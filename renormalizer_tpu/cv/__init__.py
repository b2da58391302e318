from renormalizer_tpu.cv.spectra_cv import SpectraCv, batch_run
from renormalizer_tpu.cv.zerot import SpectraZtCV
from renormalizer_tpu.cv.finitet import SpectraFtCV
