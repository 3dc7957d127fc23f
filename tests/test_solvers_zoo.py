"""Per-solver problem-zoo sweep with callback + consistency invariants.

Mirrors the reference per-solver unit tests (reference: tests/test_cg.py,
test_gmres.py, test_bicg.py, ...): each solver runs over the subset of
canonical problems it mathematically supports, with the callback contract
(count == numsteps + 1) and the assert_consistent invariants.
"""

import numpy as np
import pytest

import krylov_tpu as krylov

from .helpers import assert_consistent
from .linear_problems import (
    complex_unsymmetric,
    hermitian_indefinite,
    hpd,
    real_unsymmetric,
    spd_rhs_0,
    spd_rhs_0sol0,
    symmetric_indefinite,
)
from .linear_problems import spd_dense as spd

SPD_FAMILY = [spd((5,)), spd((5, 1)), spd((5, 3)), spd_rhs_0((5,)), spd_rhs_0sol0()]
HERM = [hpd(), symmetric_indefinite(), hermitian_indefinite()]
NONSYM = [real_unsymmetric(), complex_unsymmetric()]

CASES = {
    "minres": SPD_FAMILY + HERM,
    "gmres": SPD_FAMILY + HERM + NONSYM,
    "symmlq": [spd((5,)), symmetric_indefinite()],
    "bicg": [spd((5,)), hpd(), symmetric_indefinite(), hermitian_indefinite()]
    + NONSYM,
    "bicgstab": [spd((5,)), hpd()] + NONSYM,
    "cgs": [spd((5,)), hpd(), real_unsymmetric()],
    "qmr": [spd((5,)), hpd(), symmetric_indefinite(), hermitian_indefinite()]
    + NONSYM,
    "cgr": [spd((5,)), hpd(), symmetric_indefinite(), hermitian_indefinite()],
    # gcr stagnates on the nonsymmetric zoo problems (so does the reference;
    # its gcr test covers only spd/hpd/indefinite — reference: tests/test_gcr.py)
    "gcr": [spd((5,)), hpd(), symmetric_indefinite(), hermitian_indefinite()],
    "cgne": [spd((5,)), real_unsymmetric(), complex_unsymmetric()],
    "cgnr": [spd((5,)), real_unsymmetric()],
    # tfqmr is an extension (no reference counterpart): transpose-free QMR
    "tfqmr": SPD_FAMILY + HERM + NONSYM,
}

# cgnr's resnorms are normal-equations residuals ||A^H b - A^H A x||, so the
# ||b - A x|| consistency check does not apply (same caveat as the reference,
# tests/test_cgnr.py:44-46)
SKIP_CONSISTENCY = {"cgnr"}


@pytest.mark.parametrize(
    "solver,idx",
    [(s, i) for s, plist in CASES.items() for i in range(len(plist))],
)
def test_zoo(solver, idx):
    A, b = CASES[solver][idx]
    fn = getattr(krylov, solver)

    count = 0

    def callback(x, r):
        nonlocal count
        count += 1

    sol, info = fn(A, b, tol=1.0e-7, maxiter=30, callback=callback)
    assert count == info.numsteps + 1
    assert info.success
    if solver not in SKIP_CONSISTENCY:
        assert_consistent(A, b, info, sol, 1.0e-7)


@pytest.mark.parametrize("solver", ["cg", "minres", "gmres"])
def test_exact_solution_as_initial_guess(solver):
    A = np.diag([1.0e-3] + list(range(2, 11)))
    b = np.ones(10)
    x0 = np.linalg.solve(A, b)
    _, info = getattr(krylov, solver)(A, b, x0=x0)
    assert len(info.resnorms) == 1


@pytest.mark.parametrize("solver", ["cg", "minres", "gmres"])
def test_m(solver):
    a = np.linspace(1.0, 2.0, 5)
    A = np.diag(a)
    A[0, 0] = 1e-2
    b = np.ones(5)
    M = np.diag(a)
    _, info = getattr(krylov, solver)(A, b, M=M, tol=1.0e-12)
    assert info.resnorms[-1] <= 1.0e-12


@pytest.mark.parametrize("solver", ["cg", "minres", "gmres"])
def test_ml(solver):
    a = np.linspace(1.0, 2.0, 5)
    A = np.diag(a)
    A[0, 0] = 1e-2
    b = np.ones(5)
    _, info = getattr(krylov, solver)(A, b, Ml=np.diag(a), tol=1.0e-12)
    assert info.resnorms[-1] <= 1.0e-12


@pytest.mark.parametrize("solver", ["minres", "gmres"])
def test_mr(solver):
    a = np.linspace(1.0, 2.0, 5)
    A = np.diag(a)
    A[0, 0] = 1e-2
    b = np.ones(5)
    _, info = getattr(krylov, solver)(A, b, Mr=np.diag(a), tol=1.0e-12)
    assert info.resnorms[-1] <= 1.0e-12


@pytest.mark.parametrize("solver", ["cg", "minres", "gmres"])
def test_scipy_sparse(solver):
    import scipy.sparse

    n = 5
    a = np.linspace(1.0, 2.0, n)
    a[-1] = 1e-2
    A = scipy.sparse.spdiags(a, [0], n, n)
    b = np.ones(n)
    _, info = getattr(krylov, solver)(A, b, tol=1.0e-12)
    assert info.resnorms[-1] <= 1.0e-12


@pytest.mark.parametrize("solver", ["cg", "minres", "gmres"])
def test_custom_linear_operator(solver):
    n = 5

    class MyLinearOperator:
        def __init__(self):
            self.a = np.linspace(1.0, 2.0, n)
            self.a[-1] = 1e-2
            self.shape = (n, n)
            self.dtype = float

        def __matmul__(self, x):
            return self.a * np.asarray(x)

    _, info = getattr(krylov, solver)(MyLinearOperator(), np.ones(n), tol=1.0e-12)
    assert info.resnorms[-1] <= 1.0e-12


def test_gmres_minres_equivalence():
    """GMRES == MINRES on symmetric matrices (fixing the reference's own test,
    which compared minres to itself — reference: tests/test_gmres.py:66-67)."""
    import scipy.sparse

    n = 100
    data = -np.ones((3, n))
    data[1] = 2.0
    A = scipy.sparse.spdiags(data, [-1, 0, 1], n, n)
    b = np.ones(n)
    x0 = np.zeros(n)

    _, info_minres = krylov.minres(A, b, x0=x0, maxiter=3, tol=0.0)
    _, info_gmres = krylov.gmres(A, b, x0=x0, maxiter=3, tol=0.0)

    res1 = np.asarray(info_minres.resnorms)
    res2 = np.asarray(info_gmres.resnorms)
    assert np.all(np.abs(res1 - res2) < 1.0e-13 * (1 + res2))


def test_orthogonalization_householder():
    n = 5
    a = np.array(np.linspace(1.0, 2.0, n), dtype=complex)
    a[-1] = 1e-3
    A = np.diag(a)
    A[-1, 0] = 10j
    A[0, -1] = -10j
    b = np.ones(n, dtype=complex)
    _, info = krylov.gmres(A, b, tol=1.0e-12, ortho="householder")
    assert info.success
    assert np.all(info.resnorms[-1] <= 1.0e-11)


def test_gcr_preconditioned():
    """Preconditioned (flexible) GCR — capability-exceeding extension; the
    reference left M as a TODO (reference: src/krylov/gcr.py:17)."""
    rng = np.random.default_rng(9)
    n = 40
    d = np.linspace(1.0, 200.0, n)
    A = np.diag(d) + 0.05 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    M = np.diag(1.0 / d)

    sol_p, info_p = krylov.gcr(A, b, M=M, tol=1e-10, maxiter=n)
    sol_n, info_n = krylov.gcr(A, b, tol=1e-10, maxiter=n)
    assert info_p.success
    assert_consistent(A, b, info_p, sol_p, 1e-10)
    # preconditioning must actually help on this spectrum
    assert info_p.numsteps <= info_n.numsteps

    # M=None reduces exactly to the unpreconditioned trajectory
    from krylov_tpu._operators import Identity

    sol_i, info_i = krylov.gcr(A, b, M=Identity(), tol=1e-10, maxiter=n)
    np.testing.assert_allclose(
        np.asarray(info_i.resnorms), np.asarray(info_n.resnorms), rtol=1e-13
    )

    # both backends agree with M
    sol_w, info_w = krylov.gcr(
        A, b, M=M, tol=1e-10, maxiter=n, backend="while_loop"
    )
    assert info_w.numsteps == info_p.numsteps
    np.testing.assert_allclose(
        np.asarray(info_w.resnorms), np.asarray(info_p.resnorms),
        rtol=1e-8, atol=1e-12,
    )
