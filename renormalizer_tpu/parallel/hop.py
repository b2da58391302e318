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
# shapes; reset with ``reset_stats()``.  ``engaged`` additionally records
# each distinct sharded executable (formula + operand shapes) with its call
# count so the collective traffic of a run can be audited post hoc
# (``collective_inventory``).
STATS = {"sharded": 0, "fallback": 0, "engaged": {}}


def reset_stats():
    STATS["sharded"] = 0
    STATS["fallback"] = 0
    STATS["engaged"] = {}


def record_engagement(mesh, formula: str, operand_shapes, cshape=None) -> bool:
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
    if engaged:
        key = (formula, operand_shapes, cshape)
        STATS["engaged"][key] = STATS["engaged"].get(key, 0) + 1
    return engaged


# --- collective traffic audit -----------------------------------------------

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2,
    "c128": 16, "c64": 8, "s32": 4, "s64": 8, "u32": 4, "u64": 8, "pred": 1,
}

_COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def hlo_collective_inventory(hlo_text: str) -> dict:
    """Static collective instruction counts + payload bytes from compiled
    HLO text.

    Every collective HLO instruction reads like
    ``%all-gather.3 = f32[32,2,2,32]{3,2,1,0} all-gather(...)``; the result
    shape is the per-replica payload.  Counts are per EXECUTION of the
    executable; ops inside a ``while`` body execute once per loop trip, so
    for an iterative solver the numbers are per solver iteration x the
    static count.  (The dryrun multiplies by the recorded call counts to
    report per-sweep traffic.)"""
    import re

    inv = {}
    # result shapes may be tuples: "(f32[8,4], f32[8,4]) all-reduce(...)"
    pat = re.compile(
        r"=\s*(\(?[a-z0-9\[\],\s{}/#_*]+\)?)\s+(" + "|".join(_COLLECTIVE_OPS) + r")\(")
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in pat.finditer(hlo_text):
        shapes, op = m.group(1), m.group(2)
        nbytes = 0
        for dt, dims in shape_pat.findall(shapes):
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES[dt]
        ent = inv.setdefault(op, {"count": 0, "bytes": 0})
        ent["count"] += 1
        ent["bytes"] += nbytes
    return inv


def collective_inventory(fn, *example_args) -> dict:
    """Compile ``fn`` AOT on its example args and return the static
    collective inventory of the resulting executable."""
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    texts = compiled.as_text()
    if not isinstance(texts, str):  # pragma: no cover - multi-module
        texts = "\n".join(texts)
    return hlo_collective_inventory(texts)


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


# --- generalized (tree) hop ---------------------------------------------------

@lru_cache(maxsize=None)
def _parse_shard_axes_general(formula: str, operand_shapes, ni: int, nj: int):
    """Find two distinct operands whose free (output) axes can carry the
    ``i``/``j`` mesh axes for an ARBITRARY hop einsum.

    An output label owned by exactly one input term is a free bra axis of
    that term: slicing the term along it slices the output along the same
    label with every other operand replicated (einsum distributes over
    concatenation along a free axis).  This subsumes the MPS L/R case and
    covers tree effective-H contractions, where the bra bonds live on child
    and parent environment tensors.  Returns
    ``((term_a, ax_a, out_a), (term_b, ax_b, out_b))`` or ``None``."""
    ins, out = formula.split("->")
    terms = ins.split(",")
    owner = {}
    for t_idx, term in enumerate(terms):
        for c in set(term):
            owner[c] = -1 if c in owner else t_idx
    # the last term is the local (ket) tensor x: its axes are not bra bonds
    cands = [
        (owner[c], terms[owner[c]].index(c), out.index(c))
        for c in out
        if owner.get(c, -1) not in (-1, len(terms) - 1)
    ]
    for a in cands:
        if operand_shapes[a[0]][a[1]] % ni != 0:
            continue
        for b in cands:
            if b[0] == a[0]:
                continue
            if operand_shapes[b[0]][b[1]] % nj == 0:
                return a, b
    return None


def sharded_general_hop_factory(mesh, formula: str, operand_shapes, cshape):
    """Like ``sharded_hop_factory`` but for arbitrary effective-H einsums
    (tree tensor networks): shards the two divisible free bra axes found by
    ``_parse_shard_axes_general`` over ``i``/``j`` and re-assembles the
    output with one tiled ``all_gather`` per axis."""
    if mesh is None:
        return None
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    ni, nj = axes.get("i", 1), axes.get("j", 1)
    if ni * nj == 1:
        return None
    parsed = _parse_shard_axes_general(formula, tuple(operand_shapes), ni, nj)
    if parsed is None:
        return None
    (ta, aa, oa), (tb, ab, ob) = parsed

    def spec(ndim, ax, name):
        s = [None] * ndim
        s[ax] = name
        return P(*s)

    in_specs = []
    for t_idx, shape in enumerate(operand_shapes):
        if t_idx == ta:
            in_specs.append(spec(len(shape), aa, "i"))
        elif t_idx == tb:
            in_specs.append(spec(len(shape), ab, "j"))
        else:
            in_specs.append(P())
    in_specs.append(P())  # x replicated

    def body(*args):
        *operands, x = args
        blk = jnp.einsum(formula, *operands, x.reshape(cshape), optimize="optimal")
        blk = jax.lax.all_gather(blk, "i", axis=oa, tiled=True)
        blk = jax.lax.all_gather(blk, "j", axis=ob, tiled=True)
        return blk.ravel()

    kwargs = dict(mesh=mesh, in_specs=tuple(in_specs), out_specs=P())
    import inspect

    params = inspect.signature(shard_map).parameters
    if "check_vma" in params:  # jax >= 0.8 public API
        kwargs["check_vma"] = False
    else:  # pragma: no cover - legacy experimental API
        kwargs["check_rep"] = False
    return shard_map(body, **kwargs)


def audit_engaged_collectives(mesh, n_sweeps: int = 1) -> dict:
    """Compile every distinct engaged sharded hop recorded in
    ``STATS['engaged']`` and report its per-matvec collective inventory.

    ``per_sweep`` aggregates count/bytes over the recorded call counts
    divided by ``n_sweeps``.  One matvec per solver call is a LOWER bound:
    iterative solvers run one matvec per Davidson/Lanczos iteration,
    multiplying the traffic by the iteration count."""
    import numpy as np

    executables = []
    totals = {}
    for (formula, operand_shapes, cshape), calls in STATS["engaged"].items():
        hop = sharded_hop_factory(mesh, formula, operand_shapes, cshape)
        if hop is None:
            hop = sharded_general_hop_factory(mesh, formula, operand_shapes, cshape)
        if hop is None:  # pragma: no cover - engagement gate said yes
            continue
        from renormalizer_tpu.backend import backend

        dummies = [jnp.zeros(s, dtype=backend.real_dtype) for s in operand_shapes]
        x = jnp.zeros(int(np.prod(cshape)), dtype=backend.real_dtype)
        inv = collective_inventory(hop, *dummies, x)
        executables.append({
            "formula": formula,
            "x_shape": list(cshape),
            "calls": calls,
            "per_matvec": inv,
        })
        for op, ent in inv.items():
            tot = totals.setdefault(op, {"count": 0, "bytes": 0})
            tot["count"] += ent["count"] * calls
            tot["bytes"] += ent["bytes"] * calls
    per_sweep = {
        op: {"count": round(ent["count"] / n_sweeps, 1),
             "bytes": round(ent["bytes"] / n_sweeps)}
        for op, ent in totals.items()
    }
    return {"executables": executables, "per_sweep_lower_bound": per_sweep,
            "note": "one matvec per recorded solver call; iterative solvers "
                    "multiply by their iteration count"}


def record_engagement_general(mesh, formula: str, operand_shapes,
                              cshape=None) -> bool:
    """``record_engagement`` for the generalized (tree) hop."""
    engaged = False
    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        ni, nj = axes.get("i", 1), axes.get("j", 1)
        if ni * nj > 1:
            engaged = _parse_shard_axes_general(
                formula, tuple(operand_shapes), ni, nj) is not None
    STATS["sharded" if engaged else "fallback"] += 1
    if engaged:
        key = (formula, tuple(operand_shapes), cshape)
        STATS["engaged"][key] = STATS["engaged"].get(key, 0) + 1
    return engaged
