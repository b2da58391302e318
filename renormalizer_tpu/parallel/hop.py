r"""Bond-tensor-parallel effective-Hamiltonian application.

The hop einsum (``ops.contract._HOP_FORMULAS``) contracts
``L, W..., R, x -> out``.  Sharding layout: ``L`` is partitioned along its
uncontracted (bra) bond over mesh axis ``i``, ``R`` along its bra bond over
``j``, the MPO cores and the local tensor ``x`` are replicated.  Every
device computes its ``(i, j)`` block of ``H @ x`` with zero communication;
one tiled ``all_gather`` per axis re-assembles the full result on the ICI.
FLOPs scale 1/(ni*nj); communication is one |x|-sized gather per matvec —
the standard tensor-parallel recipe (contract local, gather once).

Falls back (returns ``None``) when the sharded axes are not divisible by
the mesh — the small edge sites of a sweep stay single-device while the
expensive interior sites are distributed.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.8: the supported public name
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


# per-process counters: how many effective-H solver calls actually engaged
# the bond-tensor-parallel path vs fell back to single-device (divisibility
# gate).  Read by dryrun_multichip to prove sharding engages at production
# shapes; reset with ``reset_stats()``.
STATS = {"sharded": 0, "fallback": 0}


def reset_stats():
    STATS["sharded"] = 0
    STATS["fallback"] = 0


def record_engagement(mesh, formula: str, operand_shapes) -> bool:
    """Would ``sharded_hop_factory`` shard this call?  Increments STATS."""
    engaged = False
    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ni, nj = axes.get("i", 1), axes.get("j", 1)
        parsed = _parse_shard_axes(formula) if ni * nj > 1 else None
        if parsed is not None:
            _, l_ax, r_ax, *_ = parsed
            lshape, rshape = operand_shapes[0], operand_shapes[-1]
            engaged = lshape[l_ax] % ni == 0 and rshape[r_ax] % nj == 0
    STATS["sharded" if engaged else "fallback"] += 1
    return engaged


@lru_cache(maxsize=None)
def _parse_shard_axes(formula: str):
    """Positions of the shardable bra-bond axes: (L axis, R axis, their
    positions in the output subscript)."""
    ins, out = formula.split("->")
    terms = ins.split(",")
    lterm, rterm = terms[0], terms[-2]
    l_lab = next((c for c in lterm if c in out), None)
    r_lab = next((c for c in rterm if c in out and c != l_lab), None)
    if l_lab is None or r_lab is None:
        return None
    return (
        len(terms),
        lterm.index(l_lab),
        rterm.index(r_lab),
        out.index(l_lab),
        out.index(r_lab),
        len(out),
    )


def sharded_hop_factory(mesh, formula: str, operand_shapes, cshape):
    """A sharded ``hop(operands..., x) -> H@x`` or ``None`` if the formula
    or shapes cannot be distributed over ``mesh``."""
    if mesh is None:
        return None
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    ni, nj = axes.get("i", 1), axes.get("j", 1)
    if ni * nj == 1:
        return None
    parsed = _parse_shard_axes(formula)
    if parsed is None:
        return None
    nterms, l_ax, r_ax, out_l, out_r, out_ndim = parsed
    lshape, rshape = operand_shapes[0], operand_shapes[-1]
    if lshape[l_ax] % ni != 0 or rshape[r_ax] % nj != 0:
        return None

    def spec(ndim, ax, name):
        s = [None] * ndim
        s[ax] = name
        return P(*s)

    in_specs = [spec(len(lshape), l_ax, "i")]
    in_specs += [P()] * (nterms - 3)  # MPO cores replicated
    in_specs += [spec(len(rshape), r_ax, "j"), P()]  # R sharded, x replicated

    def body(*args):
        *operands, x = args
        blk = jnp.einsum(formula, *operands, x.reshape(cshape), optimize="optimal")
        blk = jax.lax.all_gather(blk, "i", axis=out_l, tiled=True)
        blk = jax.lax.all_gather(blk, "j", axis=out_r, tiled=True)
        return blk.ravel()

    kwargs = dict(mesh=mesh, in_specs=tuple(in_specs), out_specs=P())
    import inspect

    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:  # jax >= 0.8 public API
        kwargs["check_vma"] = False
    else:  # pragma: no cover - legacy experimental API
        kwargs["check_rep"] = False
    return shard_map(body, **kwargs)
