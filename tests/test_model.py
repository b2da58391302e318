"""Tests for the symbolic model layer: Op/OpSum algebra, basis op_mat
matrices, Model construction.

Oracle strategy follows the reference's own tests
(``renormalizer/model/tests``): analytic matrix identities and commutators.
"""

import numpy as np
import pytest

from renormalizer_tpu.model import (
    Op,
    OpSum,
    BasisSHO,
    BasisSineDVR,
    BasisHopsBoson,
    BasisSimpleElectron,
    BasisMultiElectron,
    BasisMultiElectronVac,
    BasisHalfSpin,
    BasisDummy,
    Model,
    HolsteinModel,
    SpinBosonModel,
    Mol,
    Phonon,
    heisenberg_ops,
)
from renormalizer_tpu.utils import Quantity


@pytest.mark.fast
def test_op_algebra():
    x = Op("X", 0, 0.5)
    y = Op("Y", 1, 0.2)
    assert (3 * x).factor == 1.5
    s = x + y
    assert isinstance(s, OpSum) and len(s) == 2
    prod = x * y
    assert prod.symbol == "X Y"
    assert prod.dofs == [0, 1]
    assert np.isclose(prod.factor, 0.1)
    assert len((s * s)) == 4
    assert (s - s).simplify() == []
    combined = (s + s).simplify()
    assert [op.factor for op in combined] == [1.0, 0.4]


def test_op_qn_defaults():
    op = Op(r"a^\dagger a", [0, 1])
    assert op.qn_list[0] == 1 and op.qn_list[1] == -1
    assert op.qn == 0
    op2 = Op(r"a^\dagger", 0)
    assert op2.qn == 1


def test_op_split_elementary():
    op = Op("X Y", [3, 2], 0.5) * Op("Y X", [2, 3], 3.0) * Op("Z Z", [2, 2], 1.0)
    ops, factor = op.split_elementary({2: 0, 3: 1})
    assert np.isclose(factor, 1.5)
    assert ops[0].symbol == "Y Y Z Z"
    assert ops[1].symbol == "X X"


def test_op_squeeze_identity():
    op = Op("X I Y I", [0, 1, 2, 3], 0.5)
    sq = op.squeeze_identity()
    assert sq.symbol == "X Y" and sq.dofs == [0, 2]
    op = Op("I", 0, -0.5)
    assert op.squeeze_identity().factor == -0.5


@pytest.mark.fast
def test_basis_sho_ladder():
    b = BasisSHO(0, omega=1.3, nbas=10)
    bdag = b.op_mat(r"b^\dagger")
    bb = b.op_mat("b")
    # commutator [b, b^dag] = 1 except at the truncation boundary
    comm = bb @ bdag - bdag @ bb
    assert np.allclose(comm[:-1, :-1], np.eye(9))
    assert np.allclose(b.op_mat(r"b^\dagger b"), np.diag(np.arange(10)))
    assert np.allclose(b.op_mat(r"b^\dagger+b"), bdag + bb)
    # x in terms of ladder operators
    x = b.op_mat("x")
    assert np.allclose(x, np.sqrt(0.5 / 1.3) * (bdag + bb))
    # p^2/2 + w^2 x^2 / 2 is the oscillator Hamiltonian: check spectrum
    h = 0.5 * b.op_mat("p^2") + 0.5 * 1.3 ** 2 * b.op_mat("x^2")
    assert np.allclose(np.diag(h)[:-1], 1.3 * (np.arange(9) + 0.5))


def test_basis_sho_x_moments():
    b = BasisSHO(0, omega=0.8, nbas=16)
    x = b.op_mat("x")
    # x^2 from analytic ladder formula vs squared matrix: agree away from edge
    x2 = b.op_mat("x^2")
    assert np.allclose((x @ x)[:8, :8], x2[:8, :8])
    x3 = b.op_mat("x^3")
    assert np.allclose((x @ x @ x)[:6, :6], x3[:6, :6])
    assert np.allclose(b.op_mat("x x"), x2)
    # general moment path agrees with hard-coded
    bg = BasisSHO(0, omega=0.8, nbas=16, general_xp_power=True)
    assert np.allclose(bg.op_mat("x")[:10, :10], x[:10, :10])
    assert np.allclose(bg.op_mat("x^2")[:8, :8], x2[:8, :8])


def test_basis_sho_x0():
    # with origin shift, <0|x|0> = x0
    b = BasisSHO(0, omega=1.0, nbas=8, x0=1.5)
    assert np.isclose(b.op_mat("x")[0, 0], 1.5)
    assert np.isclose(b.op_mat("x^2")[0, 0], 1.5 ** 2 + 0.5)


def test_basis_sho_dvr():
    b = BasisSHO(0, omega=1.0, nbas=32, dvr=True)
    # spectrum preserved in DVR representation
    h = 0.5 * b.op_mat("p^2") + 0.5 * b.op_mat("x^2")
    w = np.linalg.eigvalsh(h)
    assert np.allclose(w[:5], np.arange(5) + 0.5, atol=1e-6)


def test_basis_sho_dx():
    b = BasisSHO(0, omega=1.1, nbas=12)
    dx = b.op_mat("dx")
    p = b.op_mat("p")
    assert np.allclose(-1j * dx, p)
    assert np.allclose(b.op_mat("dx^2"), -b.op_mat("p^2"))
    # [x, p] = i (away from truncation edge)
    x = b.op_mat("x")
    comm = x @ p - p @ x
    assert np.allclose(comm[:-1, :-1], 1j * np.eye(12)[:-1, :-1])


def test_basis_sine_dvr():
    # particle in box of length L: energies n^2 pi^2 / (2 L^2)
    b = BasisSineDVR(0, 64, -1.0, 1.0)
    h = 0.5 * b.op_mat("p^2")
    w = np.linalg.eigvalsh(h)
    L = b.L
    expected = np.arange(1, 6) ** 2 * np.pi ** 2 / (2 * L ** 2)
    assert np.allclose(w[:5], expected, rtol=1e-6)
    # x matrix: harmonic potential in a wide box reproduces SHO spectrum
    b2 = BasisSineDVR(0, 128, -12.0, 12.0)
    h2 = 0.5 * b2.op_mat("p^2") + 0.5 * b2.op_mat("x^2")
    w2 = np.linalg.eigvalsh(h2)
    assert np.allclose(w2[:4], np.arange(4) + 0.5, atol=1e-6)
    # dx is antisymmetric
    dx = b.op_mat("dx")
    assert np.allclose(dx, -dx.T)
    # x dx identity: x dx + (x dx)^T = -I   (integration by parts)
    xdx = b2.op_mat("x dx")
    assert np.allclose(xdx + xdx.T, -np.eye(128), atol=1e-6)


def test_basis_sine_dvr_sho_displaced():
    # displaced harmonic potential via x, x^2, x^3 matrices
    b = BasisSineDVR(0, 128, -10.0, 14.0)
    h = 0.5 * b.op_mat("p^2") + 0.5 * b.op_mat("x^2") - 2.0 * b.op_mat("x")
    w = np.linalg.eigvalsh(h)
    assert np.allclose(w[:4], np.arange(4) + 0.5 - 2.0, atol=1e-6)


def test_basis_hops_boson():
    b = BasisHopsBoson(0, 5)
    bt = b.op_mat(r"\tilde{b}^\dagger")
    assert np.allclose(bt, np.diag(np.arange(1, 5), k=-1))
    tb = b.op_mat(r"\tilde{b}")
    assert np.allclose(tb, np.diag(np.ones(4), k=1))
    assert np.allclose(b.op_mat(r"b^\dagger b"), np.diag(np.arange(5)))


def test_basis_electron():
    b = BasisSimpleElectron("e")
    assert np.allclose(b.op_mat(r"a^\dagger"), [[0, 0], [1, 0]])
    assert np.allclose(b.op_mat("a"), [[0, 1], [0, 0]])
    assert np.allclose(b.op_mat(r"a^\dagger a"), [[0, 0], [0, 1]])
    assert b.sigmaqn.tolist() == [[0], [1]]


def test_basis_multi_electron():
    b = BasisMultiElectron(["e0", "e1"], [1, 1])
    m = b.op_mat(Op(r"a^\dagger a", ["e0", "e1"]))
    expected = np.zeros((2, 2))
    expected[0, 1] = 1
    assert np.allclose(m, expected)
    m2 = b.op_mat(Op(r"a a^\dagger", ["e0", "e1"]))
    assert np.allclose(m2, expected.T)
    with pytest.raises(ValueError):
        b.op_mat(Op("a", "e0"))


def test_basis_multi_electron_vac():
    b = BasisMultiElectronVac(["e0", "e1"])
    assert b.nbas == 3
    assert b.sigmaqn.tolist() == [[0], [1], [1]]
    m = b.op_mat(Op(r"a^\dagger", "e0"))
    expected = np.zeros((3, 3))
    expected[1, 0] = 1
    assert np.allclose(m, expected)
    m2 = b.op_mat(Op(r"a^\dagger a", ["e0", "e1"]))
    expected2 = np.zeros((3, 3))
    expected2[1, 2] = 1
    assert np.allclose(m2, expected2)


@pytest.mark.fast
def test_basis_half_spin():
    b = BasisHalfSpin(0)
    X, Y, Z = b.op_mat("X"), b.op_mat("Y"), b.op_mat("Z")
    assert np.allclose(X @ Y - Y @ X, 2j * Z)
    assert np.allclose(b.op_mat("iY"), (1j * Y).real)
    assert np.allclose(b.op_mat("+"), [[0, 1], [0, 0]])
    assert np.allclose(b.op_mat("-"), [[0, 0], [1, 0]])
    # multi-symbol product
    assert np.allclose(b.op_mat("X Y"), X @ Y)
    assert np.allclose(b.op_mat("sigma_z"), Z)


def test_basis_dummy():
    b = BasisDummy("d")
    assert np.allclose(b.op_mat("I"), np.eye(1))


@pytest.mark.fast
def test_model_construction():
    ph = Phonon.simple_phonon(Quantity(1.0), Quantity(1.0), 4)
    mol = Mol(Quantity(0.5), [ph])
    model = HolsteinModel([mol] * 3, Quantity(0.1), scheme=2)
    assert model.nsite == 6
    assert model.n_edofs == 3
    assert model.n_vdofs == 3
    assert model.pbond_list == [2, 4, 2, 4, 2, 4]
    assert model.dof_to_siteidx[1] == 2
    assert model.dof_to_siteidx[(1, 0)] == 3
    # scheme 4 puts the electron basis in the middle
    model4 = model.switch_scheme(4)
    assert model4.nsite == 4
    assert model4.basis[1].multi_dof


def test_model_duplicate_dof():
    with pytest.raises(ValueError):
        Model([BasisHalfSpin(0), BasisHalfSpin(0)], [])


def test_spin_boson_model():
    ph = Phonon.simple_phonon(Quantity(0.5), Quantity(0.5), 4)
    model = SpinBosonModel(Quantity(0.1), Quantity(0.2), [ph])
    assert model.nsite == 2
    assert model.basis[0].is_spin


def test_heisenberg_ops():
    terms = heisenberg_ops(3)
    assert len(terms) == 6


@pytest.mark.fast
def test_phonon():
    ph = Phonon.simplest_phonon(Quantity(0.01), Quantity(5.0))
    assert ph.n_phys_dim >= 4
    assert np.isclose(ph.reorganization_energy.as_au(), 0.5 * 25 * 0.01 ** 2)
    g = ph.coupling_constant
    assert np.isclose(g ** 2 * 0.01, ph.reorganization_energy.as_au())


def test_quantity():
    q = Quantity(1, "eV")
    assert np.isclose(q.as_au(), 0.0367493, rtol=1e-3)
    assert np.isclose(Quantity(300, "K").to_beta(), 1052.58, rtol=1e-3)


def test_load_from_dict():
    """YAML-style parameter dict -> HolsteinModel round trip."""
    from renormalizer_tpu.model.model import load_from_dict
    from renormalizer_tpu.utils import Quantity

    param = {
        "temperature": [300, "K"],
        "ph modes": [[[1400, "cm-1"], [17.0, "a.u."]]],
        "j constant": [-0.1, "eV"],
        "mol num": 3,
    }
    model, temperature = load_from_dict(param, 3, lam=False)
    assert len(model.e_dofs) == 3
    assert np.isclose(temperature.as_au(), Quantity(300, "K").as_au())
    assert np.isclose(model.j_constant, Quantity(-0.1, "eV").as_au())
