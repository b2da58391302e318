#!/usr/bin/env python
"""Headline benchmark: DMRG sweep seconds at M=256 on a Holstein chain,
plus the two secondary BASELINE.md metrics (TDVP-PS steps/s on the
spin-boson config and effective-H matvec GFLOP/s with MFU).

``vs_baseline`` is the speedup over the reference (shuaigroup/Renormalizer,
NumPy backend) running the identical model/procedure on this host CPU; the
reference timings are measured once and cached in ``ref_bench.json`` /
``ref_bench_tdvp.json`` (delete to re-measure).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "s/sweep", "vs_baseline": N,
     "extra": {"tdvp_ps_steps_per_s": ..., "tdvp_vs_baseline": ...,
               "matvec_gflops": ..., "matvec_mfu_bf16": ...}}
"""

import json
import os
import sys
import time

# Persistent XLA compile cache: the warm-up sweeps are dominated by
# compilation over the tunneled device (measured round 5: first two warm
# sweeps 435 s + 589 s, all dispatch-side compile time).  The cache keys on
# HLO, so a second bench run (or the retry after a tunnel flake) skips the
# whole transient.  NOTE: jax 0.9 string configs do NOT read env vars —
# ``JAX_COMPILATION_CACHE_DIR`` silently does nothing; the explicit
# ``jax.config.update`` below is the only working switch.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_persistent_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        # 0.0: the tunneled relay compiles server-side and fast — a 0.2 s
        # threshold silently skipped almost every executable
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # pragma: no cover - older/newer config names
        print(f"# persistent compile cache unavailable: {e}", file=sys.stderr)

# headline bond dimension; RENO_BENCH_M overrides for the scaling battery
# (benchmarks/round4_scaling.sh runs M=512/1024 for the compute-bound points)
M = int(os.environ.get("RENO_BENCH_M", "256"))
NMOLS = 6
PH_LEVELS = [6, 6]
NSWEEPS_MEASURE = 4
_HERE = os.path.dirname(os.path.abspath(__file__))
REF_CACHE = os.path.join(_HERE, "ref_bench.json")
REF_TDVP_CACHE = os.path.join(_HERE, "ref_bench_tdvp.json")

# TDVP benchmark config (scaled-down reference example/sbm.py parameters)
TDVP_ALPHA = 0.05
TDVP_NPH = 31          # 32 sites
TDVP_M = 48
TDVP_DT = 0.2
TDVP_STEPS = 4

# -- global new-work counters ------------------------------------------------
# Round 4's steady-state criterion watched 12 hand-listed jit factories and
# declared stability while other caches were still compiling; these counters
# watch EVERYTHING: every lru_cache in every renormalizer_tpu module (trace
# count) and every XLA compile event jax emits (compile count).

_COMPILES = {"n": 0}
_DISPATCHES = {"n": 0}


class _CountingJitted:
    """Counting proxy over a jitted callable (AOT methods delegate)."""

    def __init__(self, inner):
        self._inner = inner

    def __call__(self, *a, **k):
        _DISPATCHES["n"] += 1
        return self._inner(*a, **k)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _install_dispatch_counter():
    """Count every device dispatch the sweep issues (VERDICT r4 #3: publish
    the DMRG per-site dispatch count): wraps ``jax.jit`` so each call of a
    jitted closure counts, plus ``dispatch.apply_primitive`` so EAGER ops
    (each its own tiny executable + relay round trip) count too.  The
    library reads ``jax.jit`` dynamically inside its lru-cached factories,
    so installing before the factories run covers every jitted closure."""
    import jax
    from jax._src import dispatch as _dispatch

    if getattr(jax.jit, "_bench_counting", False):
        return
    real_jit = jax.jit

    def counting_jit(fun=None, **kw):
        if fun is None:
            return lambda f: counting_jit(f, **kw)
        return _CountingJitted(real_jit(fun, **kw))

    counting_jit._bench_counting = True
    jax.jit = counting_jit

    real_apply = _dispatch.apply_primitive

    def counting_apply(*a, **k):
        _DISPATCHES["n"] += 1
        return real_apply(*a, **k)

    _dispatch.apply_primitive = counting_apply


def dispatch_count():
    return _DISPATCHES["n"]


def _install_compile_listener():
    import jax.monitoring

    def _on_duration(event, duration, **kwargs):
        # "/jax/core/compile/backend_compile_duration" = a real XLA compile;
        # the sibling jaxpr_trace / mlir_module events fire on every retrace
        # and would triple-count
        if "backend_compile" in event:
            _COMPILES["n"] += 1

    jax.monitoring.register_event_duration_secs_listener(_on_duration)


def compile_count():
    return _COMPILES["n"]


def trace_count():
    """Total lru_cache misses across ALL renormalizer_tpu modules: every jit
    factory in the library is lru-cached, so a sweep that adds none created
    no new jitted closure anywhere."""
    total = 0
    for name, mod in list(sys.modules.items()):
        if not name.startswith("renormalizer_tpu"):
            continue
        for attr in vars(mod).values():
            info = getattr(attr, "cache_info", None)
            if info is not None:
                try:
                    total += info().misses
                except Exception:
                    pass
    return total


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
    _install_dispatch_counter()  # BEFORE the library imports (module jits)
    _enable_persistent_cache()
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
    # Warm-up: the growth procedure reaches M, then percent=0 sweeps run
    # until the sweep wall time stabilizes.  DMRG qn-sector splits keep
    # drifting for a few sweeps after the energy converges, and every drift
    # step compiles new executables (slow over the tunneled device); a
    # production run amortizes this transient over dozens of sweeps and the
    # persistent compile cache removes it across runs, so the honest
    # metric is the steady-state sweep time, measured only after the
    # compile transient has demonstrably ended.
    warm = [[M, 0.4], [M, 0.2], [M, 0]]
    max_stable_warm = 14

    from renormalizer_tpu.mps.gs import single_sweep
    from renormalizer_tpu.mps.lib import Environ
    from renormalizer_tpu.utils import CompressConfig, CompressCriteria

    mps.ensure_left_canonical()
    environ = Environ(mps, mpo, "L")
    opt_e_idx = None
    energy = None

    phase_stats = []

    def relay_rtt():
        """One tiny blocking fetch: samples the relay round-trip latency so
        a stalled sweep can be attributed to the tunnel vs the device."""
        import numpy as _np
        import jax.numpy as _jnp

        t = time.perf_counter()
        _np.asarray(_jnp.zeros(1))
        return time.perf_counter() - t

    _install_compile_listener()

    def sweep(isweep, m, percent, tag):
        nonlocal opt_e_idx, energy, mpo
        from renormalizer_tpu.mps import trunc_device

        mps.compress_config = CompressConfig(
            criteria=CompressCriteria.fixed, max_bonddim=m)
        backend.sync()
        rtt0 = relay_rtt()
        tr0, co0, di0 = trace_count(), compile_count(), dispatch_count()
        plan0 = dict(trunc_device.PLAN_STATS)
        n_sync0 = len(trunc_device.PLAN_STATS.get("sync_sites", []))
        t0 = time.time()
        micro, _, mpo = single_sweep(mps, mpo, environ, None, percent, opt_e_idx)
        t_dispatch = time.time() - t0
        backend.sync()
        dt = time.time() - t0
        rtt1 = relay_rtt()
        new_traces, new_compiles = trace_count() - tr0, compile_count() - co0
        plan_delta = {k: trunc_device.PLAN_STATS[k] - plan0[k]
                      for k in plan0
                      if isinstance(trunc_device.PLAN_STATS.get(k), int)
                      and trunc_device.PLAN_STATS[k] != plan0[k]}
        sync_sites = trunc_device.PLAN_STATS.get("sync_sites", [])[n_sync0:]
        # phase attribution (VERDICT r3 #10): `dispatch` is host-side python
        # + async dispatch inside single_sweep, `drain` is the final sync
        # waiting on in-flight device work; the two RTT samples bracketing
        # the sweep say whether an outlier was a relay stall (elevated rtt)
        # or genuine device/compile time (normal rtt).  new_traces /
        # new_compiles attribute dispatch-side outliers to retracing vs XLA
        # compilation (VERDICT r4 #1).
        phase_stats.append({
            "tag": tag, "total_s": round(dt, 3),
            "dispatch_s": round(t_dispatch, 3),
            "drain_s": round(dt - t_dispatch, 3),
            "rtt_before_ms": round(rtt0 * 1e3, 1),
            "rtt_after_ms": round(rtt1 * 1e3, 1),
            "new_traces": new_traces,
            "new_compiles": new_compiles,
            "plan_paths": plan_delta,
            # device dispatches this sweep (jit-closure calls + eager-op
            # executables), divided by the site updates the sweep actually
            # performed (one plan-path tick per _update_mps call)
            "dispatches": dispatch_count() - di0,
            "dispatches_per_site": round(
                (dispatch_count() - di0)
                / max(1, sum(v for k, v in plan_delta.items()
                             if isinstance(v, int))), 1),
        })
        opt_e = min(micro)
        opt_e_idx = opt_e[1]
        energy = opt_e[0]
        # progress heartbeat on stderr: keeps external stall watchdogs fed
        # during the (otherwise silent) multi-minute sweep loop
        print(f"[bench] sweep {isweep} ({tag}) {dt:.2f}s "
              f"(dispatch {t_dispatch:.2f}s, rtt {rtt0*1e3:.0f}/{rtt1*1e3:.0f}ms, "
              f"traces +{new_traces}, compiles +{new_compiles}, "
              f"plan {plan_delta}"
              + (f", syncs {sync_sites}" if sync_sites else "") + ") "
              f"e={energy:.6f}", file=sys.stderr, flush=True)
        return dt

    isweep = 0
    for m, percent in warm:
        sweep(isweep, m, percent, "warm")
        isweep += 1

    def stabilize(budget):
        # sweep until (a) the qn-sector drift stops producing new
        # executables (zero new jit traces anywhere) AND (b) the sweep wall
        # time has stopped improving (the async truncation plans take a few
        # extra sweeps to arm in both directions after the shapes settle)
        nonlocal isweep
        best = float("inf")
        since_best = 0
        for _ in range(budget):
            before = trace_count()
            dt = sweep(isweep, M, 0, "stabilize")
            isweep += 1
            if dt < 0.9 * best:
                best = min(best, dt)
                since_best = 0
            else:
                since_best += 1
            if trace_count() == before and since_best >= 2:
                break

    def measure():
        nonlocal isweep
        out = []
        for _ in range(NSWEEPS_MEASURE):
            out.append(sweep(isweep, M, 0, "measure"))
            isweep += 1
        return out

    # variance guard (VERDICT r4 #1/#6): round 4 declared stability and then
    # measured sweeps spanning 21x.  An unstable measurement is NOT reported:
    # the bench goes back to stabilizing and re-measures, up to 3 times; if
    # the spread never closes, the WORST (max) sweep is reported instead of
    # the median so instability can only hurt the headline number, never
    # hide behind it.
    stabilize(max_stable_warm)
    attempts = 0
    while True:
        times = measure()
        if max(times) <= 3.0 * min(times) or attempts >= 2:
            break
        attempts += 1
        print(f"[bench] measured sweeps unstable "
              f"(max/min={max(times)/min(times):.1f}); re-stabilizing "
              f"(attempt {attempts})", file=sys.stderr, flush=True)
        stabilize(6)
    if max(times) <= 3.0 * min(times):
        med = sorted(times)[len(times) // 2]
    else:
        med = max(times)
    return med, energy, model, times, phase_stats[-NSWEEPS_MEASURE:]


def _tdvp_model_mps(renormalizer_pkg):
    """Identical TDVP workload for both engines: random M=48 state on the
    scaled-down sbm.py model, non-adaptive TDVP-PS."""
    sbm_lib = __import__(f"{renormalizer_pkg}.sbm.lib", fromlist=["param2mollist"])
    utils = __import__(f"{renormalizer_pkg}.utils", fromlist=["Quantity", "EvolveConfig", "EvolveMethod"])
    mps_mod = __import__(f"{renormalizer_pkg}.mps", fromlist=["Mps", "Mpo"])
    Quantity = utils.Quantity
    model = sbm_lib.param2mollist(TDVP_ALPHA, Quantity(1), Quantity(20), 1, TDVP_NPH)
    mpo = mps_mod.Mpo(model)
    mps = mps_mod.Mps.random(model, 0, TDVP_M, percent=1.0)
    mps.evolve_config = utils.EvolveConfig(utils.EvolveMethod.tdvp_ps, adaptive=False)
    return mps, mpo


def _tdvp_holstein_model_mps():
    """qn-STRUCTURED TDVP workload (VERDICT r4 #3 done-criterion): a qntot=1
    Holstein exciton on the DMRG bench chain — every bond carries a
    non-trivial charge sector, so this measures the qn-masked fused site
    update rather than the trivial-sector fast path the sbm config hits."""
    from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
    from renormalizer_tpu.utils import (EvolveConfig, EvolveMethod, Quantity)
    from renormalizer_tpu.mps import Mps, Mpo

    args = build_model_args()
    ph_list = [
        Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), 4)
        for w, d in zip(args["omegas_cm"], args["displacements_au"])
    ]
    mol = Mol(Quantity(args["elocalex_ev"], "eV"), ph_list)
    model = HolsteinModel([mol] * args["nmols"], Quantity(args["j_ev"], "eV"))
    mpo = Mpo(model)
    mps = Mps.random(model, 1, TDVP_M, percent=1.0)
    mps.evolve_config = EvolveConfig(EvolveMethod.tdvp_ps, adaptive=False)
    return mps, mpo


def bench_tdvp(model_mps=None):
    """TDVP-PS steps/s (BASELINE.md row 2; ref comparator
    ``renormalizer/mps/mps.py:1267``).  Steady-state protocol mirroring the
    DMRG bench: warm until a step adds no new jit traces (bond dims settle
    after the first sweeps), then measure per-step wall times and report
    the median (all samples published)."""
    from renormalizer_tpu.backend import backend

    _install_compile_listener()
    _enable_persistent_cache()
    mps, mpo = model_mps() if model_mps else _tdvp_model_mps("renormalizer_tpu")
    mps = mps.evolve(mpo, TDVP_DT)  # first step: bond growth + compiles
    for _ in range(6):
        before = trace_count()
        t0 = time.time()
        mps = mps.evolve(mpo, TDVP_DT)
        backend.sync()
        warm_dt = time.time() - t0
        print(f"[bench] tdvp warm step {warm_dt:.2f}s "
              f"(new traces: {trace_count() - before})",
              file=sys.stderr, flush=True)
        if trace_count() == before:
            break
    step_times = []
    for _ in range(TDVP_STEPS):
        t0 = time.time()
        mps = mps.evolve(mpo, TDVP_DT)
        backend.sync()
        step_times.append(round(time.time() - t0, 3))
        print(f"[bench] tdvp measure step {step_times[-1]:.2f}s",
              file=sys.stderr, flush=True)
    med = sorted(step_times)[len(step_times) // 2]
    return 1.0 / med, step_times


def bench_tdvp_reference():
    if os.path.exists(REF_TDVP_CACHE):
        with open(REF_TDVP_CACHE) as f:
            return json.load(f)["steps_per_s"]
    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        return None
    sys.path.insert(0, ref_path)
    try:
        for mod in list(sys.modules):
            if mod.startswith("renormalizer"):
                del sys.modules[mod]
        mps, mpo = _tdvp_model_mps("renormalizer")
        mps = mps.evolve(mpo, TDVP_DT)  # warm
        t0 = time.time()
        for _ in range(TDVP_STEPS):
            mps = mps.evolve(mpo, TDVP_DT)
        steps_per_s = TDVP_STEPS / (time.time() - t0)
        with open(REF_TDVP_CACHE, "w") as f:
            json.dump({"steps_per_s": steps_per_s, "M": TDVP_M,
                       "n_phonons": TDVP_NPH, "dt": TDVP_DT}, f)
        return steps_per_s
    except Exception as e:  # pragma: no cover
        print(f"# reference tdvp bench failed: {e}", file=sys.stderr)
        return None
    finally:
        sys.path.remove(ref_path)
        for mod in list(sys.modules):
            if mod.startswith("renormalizer") and not mod.startswith("renormalizer_tpu"):
                del sys.modules[mod]


# bf16 matmul peak per chip by device kind (the MXU number; fp32 inputs run
# as multi-pass bf16 so this is the honest roofline denominator)
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}

# HBM bandwidth per chip (bytes/s) — the other roofline axis: if the hot op
# moves more bytes/FLOP than the ridge point, BW utilization is the honest
# efficiency number, not MFU
_PEAK_HBM = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,
}


def bench_matvec(model):
    """2-site effective-H matvec: GFLOP/s + MFU (BASELINE.md row 3).

    Uses the exact einsum the fused Davidson runs at the DMRG bench's
    steady-state mid-chain shapes; FLOPs from XLA's own cost analysis."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from renormalizer_tpu.backend import backend
    from renormalizer_tpu.mps import Mpo

    mpo = Mpo(model)
    mid = len(mpo) // 2
    w1 = mpo[mid].shape
    w2 = mpo[mid + 1].shape
    d1, d2 = w1[1], w2[1]
    dt = backend.real_dtype
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(dt))

    L = arr(M, w1[0], M)
    R = arr(M, w2[-1], M)
    W1 = arr(*w1)
    W2 = arr(*w2)
    c = arr(M, d1, d2, M)
    from renormalizer_tpu.ops.contract import hop_spec

    formula, operands = hop_spec(L, R, [W1, W2], c.shape)

    fn = jax.jit(lambda x, *ops: jnp.einsum(formula, *ops, x, optimize="optimal"))
    # XLA's own flop count for the compiled executable
    lowered = fn.lower(c, *operands)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        flops = float(cost["flops"])
    except Exception:
        cost, flops = {}, None
    bytes_accessed = float(cost.get("bytes accessed", 0.0)) or None
    out = fn(c, *operands)
    # block_until_ready does not truly synchronize over the axon relay;
    # fetching one element does (same endpoint discipline as the kernel
    # microbenches) — the 50 chained iterations amortize that single RTT
    np.asarray(out.ravel()[:1])
    niter = 50
    t0 = time.perf_counter()
    x = c
    for _ in range(niter):
        x = fn(x, *operands)
    np.asarray(x.ravel()[:1])
    dt_s = (time.perf_counter() - t0) / niter
    res = {"matvec_ms": round(dt_s * 1e3, 3)}
    kind = jax.devices()[0].device_kind
    # measured f32 matmul peak: the library enforces true-f32 matmuls
    # (bf16 passes lose DMRG variationality, see README), and on the MXU
    # f32 runs as multi-pass bf16 at a fraction of the bf16 number — so the
    # honest "are we at the wall" denominator is the best f32 GEMM this
    # chip actually achieves, measured here on a 4096^2 square matmul
    try:
        # scaled so repeated powers stay finite (spectral norm ~2*sqrt(n))
        a_pk = jnp.asarray(
            (rng.standard_normal((4096, 4096)) / 128.0).astype(np.float32))
        mm = jax.jit(lambda a: a @ a)
        y = mm(a_pk)
        np.asarray(y.ravel()[:1])
        t0 = time.perf_counter()
        y = a_pk
        for _ in range(10):
            y = mm(y)
        np.asarray(y.ravel()[:1])
        pk_dt = (time.perf_counter() - t0) / 10
        f32_peak = 2 * 4096**3 / pk_dt
        res["f32_matmul_peak_gflops"] = round(f32_peak / 1e9, 1)
    except Exception:
        f32_peak = None
    if flops:
        gflops = flops / dt_s / 1e9
        res["matvec_gflops"] = round(gflops, 1)
        peak = _PEAK_BF16.get(kind)
        if peak:
            res["matvec_mfu_bf16"] = round(flops / dt_s / peak, 4)
            res["device_kind"] = kind
        if f32_peak:
            # fraction of the f32 GEMM rate this chip MEASURABLY sustains:
            # the wall that binds a precision-constrained DMRG
            res["matvec_frac_f32_peak"] = round(flops / dt_s / f32_peak, 4)
    # roofline: which wall is the op actually near?  bytes from XLA's cost
    # analysis (HBM traffic of the fused executable)
    if bytes_accessed:
        gbps = bytes_accessed / dt_s / 1e9
        res["matvec_gbps"] = round(gbps, 1)
        peak_bw = _PEAK_HBM.get(kind)
        if peak_bw:
            res["matvec_hbm_util"] = round(bytes_accessed / dt_s / peak_bw, 4)
        if flops:
            # arithmetic intensity vs the ridge point says which bound binds
            res["matvec_flops_per_byte"] = round(flops / bytes_accessed, 2)
    return res


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
        blas_threads = {
            k: os.environ.get(k)
            for k in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS")
        }
        with open(REF_CACHE, "w") as f:
            json.dump({"s_per_sweep": s_per_sweep, "config": args, "M": M,
                       "nsweeps_measured": NSWEEPS_MEASURE,
                       "cpu_count": os.cpu_count(),
                       "blas_threads_env": blas_threads}, f)
        return s_per_sweep
    except Exception as e:  # pragma: no cover
        print(f"# reference bench failed: {e}", file=sys.stderr)
        return None
    finally:
        sys.path.remove(ref_path)


# ---------------------------------------------------------------------------
# crash-isolated orchestration
#
# Round-2 lost the TDVP metric to an uncatchable XLA SIGABRT mid-process:
# one compiler crash erased every not-yet-printed number.  Each sub-bench now
# runs in its OWN subprocess; the parent collects whatever succeeds, retries
# transient tunnel failures with backoff, and always prints the one JSON line
# with every metric that survived.  Partial results are flushed to
# ``bench_partial.json`` after every sub-bench.
# ---------------------------------------------------------------------------

_NSITES = NMOLS * (len(PH_LEVELS) + 1)

SUB_BENCHES = {}


def _sub(name):
    def deco(fn):
        SUB_BENCHES[name] = fn
        return fn
    return deco


@_sub("dmrg")
def _sub_dmrg():
    value, energy, _, times, phases = bench_tpu()
    return {"s_per_sweep": value, "energy": energy,
            "sweep_times_s": [round(t, 3) for t in times],
            "sweep_mean_s": round(sum(times) / len(times), 3),
            "sweep_phases": phases}


@_sub("matvec")
def _sub_matvec():
    from renormalizer_tpu.model import HolsteinModel, Mol, Phonon
    from renormalizer_tpu.utils import Quantity

    args = build_model_args()
    ph_list = [
        Phonon.simple_phonon(Quantity(w, "cm-1"), Quantity(d), n)
        for w, d, n in zip(args["omegas_cm"], args["displacements_au"], args["ph_levels"])
    ]
    mol = Mol(Quantity(args["elocalex_ev"], "eV"), ph_list)
    model = HolsteinModel([mol] * args["nmols"], Quantity(args["j_ev"], "eV"))
    return bench_matvec(model)


@_sub("tdvp")
def _sub_tdvp():
    steps_per_s, step_times = bench_tdvp()
    return {"tdvp_ps_steps_per_s": round(steps_per_s, 3),
            "tdvp_step_times_s": step_times}


@_sub("tdvp_h")
def _sub_tdvp_holstein():
    steps_per_s, step_times = bench_tdvp(_tdvp_holstein_model_mps)
    return {"tdvp_holstein_steps_per_s": round(steps_per_s, 3),
            "tdvp_holstein_step_times_s": step_times}


@_sub("ref")
def _sub_ref():
    ref = bench_reference()
    return {"ref_s_per_sweep": ref}


@_sub("ref_tdvp")
def _sub_ref_tdvp():
    return {"tdvp_ref_steps_per_s": bench_tdvp_reference()}


def _run_sub(name, timeout_s=2400, attempts=3, env_extra=None):
    """Run one sub-bench in a subprocess; parse its last JSON stdout line.
    Retries with backoff on any failure (tunnel flakiness, compiler
    SIGABRT).  Returns {} when every attempt fails."""
    import subprocess

    for attempt in range(attempts):
        env = dict(os.environ)
        env.update(env_extra or {})
        # the TDVP bench runs complex kernels: if the tunnel's compiler
        # rejects complex XLA types, fall back to the all-real split kernels
        # on the later attempts
        if name in ("tdvp", "tdvp_h") and attempt > 0:
            env["RENO_SPLIT_COMPLEX"] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--sub", name],
                capture_output=True, text=True, timeout=timeout_s, env=env,
            )
        except subprocess.TimeoutExpired:
            print(f"# sub-bench {name} attempt {attempt}: timeout", file=sys.stderr)
            continue
        for line in reversed(proc.stdout.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                    if name in ("tdvp", "tdvp_h") and attempt > 0:
                        out[name + "_split_complex"] = True
                    return out
                except json.JSONDecodeError:
                    break
        tail = (proc.stderr or "")[-500:]
        print(f"# sub-bench {name} attempt {attempt} failed (rc={proc.returncode}): {tail}",
              file=sys.stderr)
        time.sleep(15 * (attempt + 1))
    return {}


def main():
    partial_path = os.path.join(_HERE, "bench_partial.json")
    acc = {}

    def flush():
        with open(partial_path, "w") as f:
            json.dump(acc, f)

    for name, timeout_s in (("dmrg", 3600), ("ref", 2400), ("matvec", 900),
                            ("tdvp", 1800), ("tdvp_h", 1800),
                            ("ref_tdvp", 1800)):
        acc.update(_run_sub(name, timeout_s))
        flush()

    value = acc.get("s_per_sweep")
    ref = acc.get("ref_s_per_sweep")
    vs_baseline = (ref / value) if (ref and value) else None
    extra = {k: v for k, v in acc.items()
             if k not in ("s_per_sweep", "energy", "ref_s_per_sweep")
             and v is not None}
    if acc.get("tdvp_ps_steps_per_s") and acc.get("tdvp_ref_steps_per_s"):
        extra["tdvp_ref_steps_per_s"] = round(acc["tdvp_ref_steps_per_s"], 3)
        extra["tdvp_vs_baseline"] = round(
            acc["tdvp_ps_steps_per_s"] / acc["tdvp_ref_steps_per_s"], 2)
    result = {
        "metric": f"DMRG 2-site sweep wall time (median of {NSWEEPS_MEASURE} steady-state "
                  f"sweeps; all sweep times in extra) @ M={M}, {NMOLS}-mol Holstein "
                  f"({_NSITES} sites), lower is better; vs_baseline = speedup over "
                  "reference NumPy on host CPU (1 thread, see ref_bench.json)",
        "value": round(value, 4) if value else None,
        "unit": "s/sweep",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "energy": acc.get("energy"),
        "extra": extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sub":
        out = SUB_BENCHES[sys.argv[2]]()
        print(json.dumps(out))
    else:
        main()
