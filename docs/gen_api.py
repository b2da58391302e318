#!/usr/bin/env python
"""Generate ``docs/api_reference.md`` from the live package.

Walks every public subpackage of ``renormalizer_tpu``, introspects the
classes and functions importable from each subpackage ``__init__`` (falling
back to the public names defined in its modules), and emits one markdown
section per module with the signature and the first docstring line of every
public symbol — including every public method of every public class.

Run on CPU so generation never needs the tunneled device:

    JAX_PLATFORMS=cpu RENO_DTYPE=fp64 python docs/gen_api.py

Reference counterpart: the Sphinx tree at ``doc/source/api.rst`` of
shuaigroup/Renormalizer (autoclass/autofunction per module).
"""

import importlib
import inspect
import io
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("RENO_DTYPE", "fp64")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

SUBPACKAGES = [
    ("renormalizer_tpu", "Top-level exports"),
    ("renormalizer_tpu.model", "Models, operators and local bases"),
    ("renormalizer_tpu.model.h_qc", "Quantum-chemistry model builder"),
    ("renormalizer_tpu.mps", "Matrix-product engine"),
    ("renormalizer_tpu.mps.gs", "Ground state (DMRG) driver"),
    ("renormalizer_tpu.mps.tda", "Tangent-space excited states"),
    ("renormalizer_tpu.mps.thermalprop", "Imaginary-time thermal propagation"),
    ("renormalizer_tpu.mps.offload", "HBM-host memory tiering"),
    ("renormalizer_tpu.tn", "Tree tensor networks"),
    ("renormalizer_tpu.spectra", "Time-domain and exact spectra"),
    ("renormalizer_tpu.cv", "Correction-vector (DDMRG) spectra"),
    ("renormalizer_tpu.transport", "Charge transport"),
    ("renormalizer_tpu.sbm", "Spin-boson dynamics"),
    ("renormalizer_tpu.property", "Per-step property evaluation"),
    ("renormalizer_tpu.vibration", "Vibrational SCF"),
    ("renormalizer_tpu.vibronic", "Vibronic dynamics"),
    ("renormalizer_tpu.parallel", "Multi-chip meshes and sharded kernels"),
    ("renormalizer_tpu.utils", "Units, configs, logging, TdMpsJob"),
    ("renormalizer_tpu.lib.solvers", "Device eigen/Krylov/IVP solvers"),
    ("renormalizer_tpu.ops.contract", "Contraction and effective-H kernels"),
]


def first_line(obj):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    line = doc.strip().splitlines()[0].strip()
    return line


def sig_of(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def public_members(mod):
    """Public classes/functions defined in (or re-exported by) ``mod``."""
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in sorted(names):
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if inspect.isclass(obj) or callable(obj):
            home = getattr(obj, "__module__", "") or ""
            if not home.startswith("renormalizer_tpu"):
                continue
            out.append((n, obj))
    return out


def class_methods(cls):
    seen = set()
    rows = []
    for n, m in inspect.getmembers(cls):
        if n.startswith("_") or n in seen:
            continue
        seen.add(n)
        if isinstance(inspect.getattr_static(cls, n, None), property):
            rows.append((n, "property", first_line(m) or ""))
        elif inspect.isfunction(m) or inspect.ismethod(m):
            if getattr(m, "__qualname__", "").split(".")[0] != cls.__name__:
                continue  # inherited: documented on the defining class
            rows.append((n, sig_of(m), first_line(m)))
    return rows


def emit(out):
    out.write("# API reference\n\n")
    out.write(
        "Generated from the live package by `docs/gen_api.py` — every public\n"
        "class, function and method with its signature and summary line.\n"
        "For a guided overview see `docs/api.md`; for reference-package\n"
        "differences see `docs/migration.md`.\n\n")
    documented = set()
    for modname, title in SUBPACKAGES:
        mod = importlib.import_module(modname)
        members = [(n, o) for n, o in public_members(mod)
                   if id(o) not in documented]
        if not members:
            continue
        out.write(f"## `{modname}` — {title}\n\n")
        for n, obj in members:
            documented.add(id(obj))
            if inspect.isclass(obj):
                out.write(f"### class `{n}{sig_of(obj)}`\n\n")
                fl = first_line(obj)
                if fl:
                    out.write(fl + "\n\n")
                rows = class_methods(obj)
                if rows:
                    out.write("| member | signature | summary |\n|---|---|---|\n")
                    for mn, ms, mdoc in rows:
                        ms_ = ms.replace("|", "\\|")
                        mdoc_ = (mdoc or "").replace("|", "\\|")
                        out.write(f"| `{mn}` | `{ms_}` | {mdoc_} |\n")
                    out.write("\n")
            else:
                out.write(f"### `{n}{sig_of(obj)}`\n\n")
                fl = first_line(obj)
                if fl:
                    out.write(fl + "\n\n")
    return out


def main():
    buf = io.StringIO()
    emit(buf)
    target = os.path.join(HERE, "api_reference.md")
    with open(target, "w") as f:
        f.write(buf.getvalue())
    nlines = buf.getvalue().count("\n")
    print(f"wrote {target} ({nlines} lines)")


if __name__ == "__main__":
    main()
