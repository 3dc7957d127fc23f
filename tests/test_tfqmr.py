"""TFQMR-specific properties (extension — no reference counterpart).

Covers what the generic zoo/backend sweeps don't: the quasi-residual
bound semantics, scipy solution equivalence, right preconditioning, and
the sharded route (trajectory parity against the single-device twin).
"""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import krylov_tpu as krylov
from krylov_tpu.parallel.solve import sharded_solve


def _problem(n=60, nonsym=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = np.eye(n) * 3.0 + rng.standard_normal((n, n)) * nonsym
    b = rng.standard_normal(n)
    return A, b


def test_matches_scipy_solution():
    A, b = _problem()
    sol, info = krylov.tfqmr(A, b, tol=1e-10, backend="while_loop")
    assert info.success
    xs, flag = scipy.sparse.linalg.tfqmr(A, b, rtol=1e-10, atol=0.0)
    assert flag == 0
    assert np.linalg.norm(np.asarray(info.xk) - xs) <= 1e-8 * np.linalg.norm(xs)


def test_quasi_residual_is_an_upper_bound():
    """Every reported entry (except the overwritten final explicit one)
    bounds the true residual norm of the iterate at that half-step."""
    A, b = _problem()
    traj = []
    sol, info = krylov.tfqmr(
        A, b, tol=1e-10,
        callback=lambda x, w: traj.append(np.linalg.norm(b - A @ np.asarray(x))),
    )
    assert info.success
    bounds = np.asarray(info.resnorms)
    true = np.asarray(traj)  # callback fires pre-loop + once per half-step
    assert bounds.shape[0] == true.shape[0]
    # small slack: the bound is exact in exact arithmetic
    assert np.all(true[:-1] <= bounds[:-1] * (1 + 1e-8) + 1e-13)


def test_right_preconditioning_reduces_steps():
    rng = np.random.default_rng(3)
    n = 80
    d = np.linspace(1.0, 500.0, n)
    A = np.diag(d) + rng.standard_normal((n, n)) * 0.5
    b = rng.standard_normal(n)
    M = np.diag(1.0 / np.diag(A))
    _, info0 = krylov.tfqmr(A, b, tol=1e-9, maxiter=2 * n)
    _, infoM = krylov.tfqmr(A, b, M=M, tol=1e-9, maxiter=2 * n)
    assert infoM.success
    assert infoM.numsteps < info0.numsteps
    r = b - A @ np.asarray(infoM.xk)
    assert np.linalg.norm(r) <= 1e-8 * (1 + np.linalg.norm(b))


def test_matvec_only_operator():
    """No rmatvec is ever requested (the method's reason to exist)."""
    A, b = _problem(40)

    class MatvecOnly:
        shape = A.shape
        dtype = A.dtype

        def __matmul__(self, x):
            return A @ x

    sol, info = krylov.tfqmr(MatvecOnly(), b, tol=1e-9)
    assert info.success
    assert np.linalg.norm(b - A @ np.asarray(info.xk)) <= 1e-7


def test_sharded_matches_single_device():
    n_side = 48
    n = n_side * n_side
    A = scipy.sparse.diags(
        [-1.0, -1.0, 4.2, -1.0, -1.0], [-n_side, -1, 0, 1, n_side],
        shape=(n, n), format="csr",
    )
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    xk, info_s = sharded_solve(krylov.tfqmr, A, b, tol=1e-9, maxiter=600)
    assert info_s.success
    assert np.linalg.norm(b - A @ np.asarray(xk)) <= 1e-7

    _, info_1 = krylov.tfqmr(A, b, tol=1e-9, maxiter=600, backend="while_loop")
    t_s = np.asarray(info_s.resnorms)
    t_1 = np.asarray(info_1.resnorms)
    assert t_s.shape == t_1.shape
    assert np.max(np.abs(t_s - t_1)) <= 1e-10 * (1 + t_1[0])


def test_maxiter_default_is_two_sweeps():
    """maxiter=None -> 2N half-steps (one Krylov dimension = 2 matvecs)."""
    n = 12
    rng = np.random.default_rng(5)
    # hard problem: don't converge, count the cap
    A = rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    sol, info = krylov.tfqmr(A, b, tol=1e-300, atol=1e-300)
    assert not info.success
    assert info.numsteps == 2 * n


def test_maxiter_explicit_N_not_doubled():
    """An explicit maxiter equal to N is honored verbatim (round-3
    advisor finding: the old N-sentinel check silently doubled it)."""
    n = 12
    rng = np.random.default_rng(6)
    A = rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    sol, info = krylov.tfqmr(A, b, tol=1e-300, atol=1e-300, maxiter=n)
    assert not info.success
    assert info.numsteps == n
    assert np.asarray(info.resnorms).shape[0] == n + 1
