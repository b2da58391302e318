from renormalizer_tpu.lib.solvers import davidson, davidson_multiroot, expm_krylov, solve_ivp
from renormalizer_tpu.lib.bipartite import bipartite_vertex_cover, max_bipartite_matching
