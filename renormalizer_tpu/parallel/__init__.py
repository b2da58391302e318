r"""Multi-chip parallelism over a ``jax.sharding.Mesh``.

The reference parallelizes with a ``multiprocessing.Pool`` over frequency
points (``renormalizer/cv/spectra_cv.py:17-50``); on TPU pods the natural
axes are instead

* ``data`` — embarrassingly parallel work units (frequency points, roots,
  trajectories) mapped to device groups;
* ``i`` / ``j`` — bond-tensor parallelism: the effective-Hamiltonian matvec
  (the DMRG/TDVP hot loop) sharded over the bra-side left/right virtual
  bonds, re-assembled with ``all_gather`` on the ICI.

Usage::

    from renormalizer_tpu.parallel import set_global_mesh, make_mesh
    set_global_mesh(make_mesh(i=2, j=2))   # 4 chips per local problem

Once a global mesh is set, ``gs.optimize_mps`` (and everything routing
through ``lib.solvers.davidson_fused``) automatically shards site updates
whose bond dimensions are divisible by the mesh axes and falls back to
single-device execution for the small edge sites.
"""

from renormalizer_tpu.parallel.mesh import (
    get_global_mesh,
    make_mesh,
    set_global_mesh,
)
from renormalizer_tpu.parallel.hop import (
    sharded_general_hop_factory,
    sharded_hop_factory,
)
