from renormalizer_tpu.tn.node import TreeNodeBasis, TreeNodeTensor, copy_connection
from renormalizer_tpu.tn.treebase import BasisTree, Tree
from renormalizer_tpu.tn.tree import TTNO, TTNS, TTNEnviron, TTNBase, from_mps
from renormalizer_tpu.tn.gs import optimize_ttns
# registers the evolution methods
from renormalizer_tpu.tn.time_evolution import EVOLVE_METHODS
from renormalizer_tpu.tn.utils_eph import max_entangled_ex
