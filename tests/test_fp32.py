"""fp32/complex64 tier: the TPU dtype policy, actually tested.

The backend decides its dtype at import, so each case runs in a fresh
subprocess with ``RENO_DTYPE=fp32`` and asserts against relaxed tolerances
(SURVEY §7 hard part 6: reference tolerances are fp64-calibrated; the fp32
tier documents what the TPU single-precision path actually delivers).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_fp32(body: str) -> dict:
    script = (
        "import os\n"
        "os.environ['RENO_PLATFORM'] = 'cpu'\n"
        "os.environ['RENO_DTYPE'] = 'fp32'\n"
        "import sys, json\n"
        f"sys.path.insert(0, {_REPO!r})\n"
        f"sys.path.insert(0, {os.path.join(_REPO, 'tests')!r})\n"
        + body
    )
    env = dict(os.environ)
    env.pop("RENO_DTYPE", None)
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        env=env, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.fp32
def test_gs_regression_fp32():
    res = _run_fp32(
        """
from fixtures import holstein_model, GS_E
from renormalizer_tpu.mps import Mps, Mpo
from renormalizer_tpu.mps.gs import optimize_mps
mpo = Mpo(holstein_model)
mps = Mps.random(holstein_model, 1, 10, percent=1.0)
mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
energies, _ = optimize_mps(mps.copy(), mpo)
print(json.dumps({"e": float(min(energies)), "ref": GS_E}))
"""
    )
    # fp32 Rayleigh quotients carry ~1e-6 relative error
    assert abs(res["e"] - res["ref"]) / abs(res["ref"]) < 5e-6


@pytest.mark.fp32
def test_gs_regression_fp32_device_trunc():
    res = _run_fp32(
        """
os.environ['RENO_DEVICE_TRUNC'] = '1'
from fixtures import holstein_model, GS_E
from renormalizer_tpu.mps import Mps, Mpo
from renormalizer_tpu.mps.gs import optimize_mps
mpo = Mpo(holstein_model)
mps = Mps.random(holstein_model, 1, 10, percent=1.0)
mps.optimize_config.procedure = [[10, 0.4], [20, 0.2], [30, 0.1], [40, 0], [40, 0]]
energies, _ = optimize_mps(mps.copy(), mpo)
print(json.dumps({"e": float(min(energies)), "ref": GS_E}))
"""
    )
    assert abs(res["e"] - res["ref"]) / abs(res["ref"]) < 5e-6


@pytest.mark.fp32
def test_evolution_oracle_fp32():
    """P&C real-time evolution vs the dense expm oracle at complex64."""
    res = _run_fp32(
        """
import numpy as np
import scipy.linalg
from fixtures import exact_model, dense_hamiltonian
from renormalizer_tpu.mps import Mps, Mpo
from renormalizer_tpu.utils import EvolveConfig, EvolveMethod
model = exact_model()
mpo = Mpo(model)
h = dense_hamiltonian(model)
mps = Mps.hartree_product_state(model, {model.e_dofs[0]: 1})
mps = mps.to_complex()
mps.evolve_config = EvolveConfig(EvolveMethod.prop_and_compress)
psi = mps.todense().ravel().astype(complex)
dt, nsteps = 0.1, 5
u = scipy.linalg.expm(-1j * dt * h)
errs = []
for _ in range(nsteps):
    mps = mps.evolve(mpo, dt)
    psi = u @ psi
    overlap = np.abs(np.vdot(psi, mps.todense().ravel()))
    errs.append(abs(1 - overlap))
print(json.dumps({"max_err": float(max(errs))}))
"""
    )
    assert res["max_err"] < 5e-5
