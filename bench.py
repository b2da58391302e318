#!/usr/bin/env python
"""Headline benchmark: DMRG sweep seconds at M=256 on a Holstein chain.

Per BASELINE.md the metric is per-sweep wall time of the 2-site DMRG
optimization at bond dimension 256.  ``vs_baseline`` is the speedup over the
reference (shuaigroup/Renormalizer, NumPy backend) running the identical
model/procedure on this host CPU; the reference timing is measured once and
cached in ``ref_bench.json`` (delete the file to re-measure).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "s/sweep", "vs_baseline": N}
"""

import json
import os
import sys
import time

M = 256
NMOLS = 6
PH_LEVELS = [6, 6]
NSWEEPS_MEASURE = 2
REF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_bench.json")


def build_model_args():
    # physical parameters follow the reference's 3-mol fixture
    # (renormalizer/tests/parameter.py), scaled to a longer chain
    return dict(
        elocalex_ev=2.67,
        j_ev=-0.1,
        omegas_cm=[106.51, 1555.55],
        displacements_au=[30.1370, 8.7729],
        ph_levels=PH_LEVELS,
        nmols=NMOLS,
    )


def bench_tpu():
    from renormalizer_tpu.backend import backend
    from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
    from renormalizer_tpu.utils import Quantity
    from renormalizer_tpu.mps import Mps, Mpo
    from renormalizer_tpu.mps.gs import optimize_mps

    args = build_model_args()
    ph_list = [
        Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
        for w, d, n in zip(args["omegas_cm"], args["displacements_au"], args["ph_levels"])
    ]
    mol = Mol(Quantity(args["elocalex_ev"], "eV"), ph_list)
    model = HolsteinModel([mol] * args["nmols"], Quantity(args["j_ev"], "eV"))

    mpo = Mpo(model)
    mps = Mps.random(model, 1, M, percent=1.0)
    # warm-up procedure reaches M quickly; the final percent=0 warm sweep
    # compiles the steady-state shapes so the measured sweeps are compile-free
    warm = [[M, 0.4], [M, 0.2], [M, 0]]
    measured = [[M, 0]] * NSWEEPS_MEASURE

    mps.optimize_config.procedure = warm
    from renormalizer_tpu.mps.gs import single_sweep
    from renormalizer_tpu.mps.lib import Environ

    # run the full optimize once for warm-up/compilation
    import renormalizer_tpu.mps.gs as gs_mod

    mps.optimize_config.procedure = warm + measured
    # manual sweep loop with timing
    mps.ensure_left_canonical()
    environ = Environ(mps, mpo, "L")
    times = []
    opt_e_idx = None
    energy = None
    for isweep, (m, percent) in enumerate(warm + measured):
        from renormalizer_tpu.utils import CompressConfig, CompressCriteria

        mps.compress_config = CompressConfig(criteria=CompressCriteria.fixed, max_bonddim=m)
        backend.sync()
        t0 = time.time()
        micro, _, mpo = single_sweep(mps, mpo, environ, None, percent, opt_e_idx)
        backend.sync()
        dt = time.time() - t0
        opt_e = min(micro)
        opt_e_idx = opt_e[1]
        energy = opt_e[0]
        if isweep >= len(warm):
            times.append(dt)
    return sum(times) / len(times), energy, model


def bench_reference():
    """Measure the reference implementation on the same model (NumPy)."""
    if os.path.exists(REF_CACHE):
        with open(REF_CACHE) as f:
            return json.load(f)["s_per_sweep"]
    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        return None
    sys.path.insert(0, ref_path)
    try:
        import importlib

        for mod in list(sys.modules):
            if mod.startswith("renormalizer"):
                del sys.modules[mod]
        from renormalizer.model import HolsteinModel, Mol, Phonon
        from renormalizer.utils import Quantity
        from renormalizer.mps import Mps, Mpo
        from renormalizer.mps.gs import optimize_mps

        args = build_model_args()
        ph_list = [
            Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
            for w, d, n in zip(args["omegas_cm"], args["displacements_au"], args["ph_levels"])
        ]
        mol = Mol(Quantity(args["elocalex_ev"], "eV"), ph_list)
        model = HolsteinModel([mol] * args["nmols"], Quantity(args["j_ev"], "eV"))
        mpo = Mpo(model)
        mps = Mps.random(model, 1, M, percent=1.0)
        warm = [[M, 0.4], [M, 0.2]]
        measured = [[M, 0]] * NSWEEPS_MEASURE
        mps.optimize_config.procedure = warm + measured

        # time the measured sweeps via per-sweep instrumentation: run warm
        # sweeps first then time the rest through optimize_mps is awkward;
        # simply run the full procedure and subtract.
        t0 = time.time()
        mps2 = mps.copy()
        mps2.optimize_config.procedure = warm
        optimize_mps(mps2, mpo)
        t_warm = time.time() - t0

        t0 = time.time()
        mps3 = mps.copy()
        mps3.optimize_config.procedure = warm + measured
        optimize_mps(mps3, mpo)
        t_all = time.time() - t0
        s_per_sweep = (t_all - t_warm) / NSWEEPS_MEASURE
        with open(REF_CACHE, "w") as f:
            json.dump({"s_per_sweep": s_per_sweep, "config": args, "M": M}, f)
        return s_per_sweep
    except Exception as e:  # pragma: no cover
        print(f"# reference bench failed: {e}", file=sys.stderr)
        return None
    finally:
        sys.path.remove(ref_path)


def main():
    # the tunneled TPU occasionally throws transient runtime errors
    # (UNIMPLEMENTED / device unavailable); retry once before giving up
    last_err = None
    for attempt in range(2):
        try:
            value, energy, model = bench_tpu()
            break
        except Exception as e:  # pragma: no cover - environment flakiness
            last_err = e
            print(f"# bench attempt {attempt} failed: {e}", file=sys.stderr)
            time.sleep(60)
    else:
        raise last_err
    ref = bench_reference()
    vs_baseline = (ref / value) if (ref and value > 0) else None
    result = {
        "metric": f"DMRG 2-site sweep wall time @ M={M}, {NMOLS}-mol Holstein "
                  f"({model.nsite} sites), lower is better; vs_baseline = speedup over "
                  "reference NumPy on host CPU",
        "value": round(value, 4),
        "unit": "s/sweep",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "energy": energy,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
