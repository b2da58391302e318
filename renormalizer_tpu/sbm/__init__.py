from renormalizer_tpu.sbm.sbm import SpinBosonDynamics
from renormalizer_tpu.sbm.lib import DebyeSDF, OhmicSDF, ColeDavidsonSDF, param2mollist
