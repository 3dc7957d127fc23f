"""LSQR (extension beyond the reference): least-squares via Golub-Kahan.

The reference reaches least-squares only through CGNE/CGNR
(reference: src/krylov/cgne.py:17-41, cgnr.py:15-21); LSQR avoids
squaring the condition number and handles rectangular systems.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import krylov_tpu as krylov

RNG = np.random.default_rng(7)


def test_lsqr_square_consistent_matches_direct():
    n = 60
    A = np.diag(np.linspace(1.0, 4.0, n)) + 0.1 * RNG.standard_normal((n, n))
    x_true = RNG.standard_normal(n)
    b = A @ x_true
    sol, info = krylov.lsqr(A, b, tol=1e-12, maxiter=300)
    assert info.success
    np.testing.assert_allclose(np.asarray(sol), x_true, atol=1e-7)
    # library contracts: resnorm history absolute, shape (numsteps+1,)
    assert info.resnorms.shape == (info.numsteps + 1,)
    assert info.resnorms[0] == pytest.approx(np.linalg.norm(b))
    # the final entry is the explicit residual (double-check overwrote it)
    r = np.linalg.norm(b - A @ np.asarray(sol))
    assert info.resnorms[-1] == pytest.approx(r, abs=1e-12)


def test_lsqr_overdetermined_matches_lstsq():
    m, n = 120, 40
    A = RNG.standard_normal((m, n))
    b = RNG.standard_normal(m)  # inconsistent: residual cannot vanish
    sol, info = krylov.lsqr(A, b, tol=1e-10, maxiter=400)
    assert info.success  # least-squares criterion (early_success path)
    want = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(sol), want, atol=1e-6)


def test_lsqr_underdetermined_min_norm():
    m, n = 30, 90
    A = RNG.standard_normal((m, n))
    b = RNG.standard_normal(m)
    sol, info = krylov.lsqr(A, b, tol=1e-12, maxiter=400)
    assert info.success
    # x0 = 0 keeps the iterates in range(A^H): the min-norm solution
    want = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(sol), want, atol=1e-7)


def test_lsqr_damped_matches_augmented_lstsq():
    m, n, damp = 80, 50, 0.7
    A = RNG.standard_normal((m, n))
    b = RNG.standard_normal(m)
    sol, info = krylov.lsqr(A, b, damp=damp, tol=1e-12, maxiter=600)
    assert info.success
    aug_A = np.vstack([A, damp * np.eye(n)])
    aug_b = np.concatenate([b, np.zeros(n)])
    want = np.linalg.lstsq(aug_A, aug_b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(sol), want, atol=1e-7)


def test_lsqr_sparse_and_scipy_agreement():
    n = 300
    A = scipy.sparse.diags(
        [-1.0, 2.4, -0.8], [-1, 0, 1], shape=(n + 40, n), format="csr"
    )
    b = RNG.standard_normal(n + 40)
    sol, info = krylov.lsqr(A, b, tol=1e-10, maxiter=800)
    assert info.success
    ref = scipy.sparse.linalg.lsqr(A, b, atol=1e-12, btol=1e-12)[0]
    np.testing.assert_allclose(np.asarray(sol), ref, atol=1e-6)


def test_lsqr_multi_rhs_blocked():
    m, n, k = 90, 45, 3
    A = RNG.standard_normal((m, n))
    B = RNG.standard_normal((m, k))
    sol, info = krylov.lsqr(A, B, tol=1e-10, maxiter=400)
    assert info.success
    want = np.linalg.lstsq(A, B, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(sol), want, atol=1e-6)
    assert info.resnorms.shape == (info.numsteps + 1, k)


def test_lsqr_complex():
    n = 50
    A = RNG.standard_normal((n, n)) + 1j * RNG.standard_normal((n, n))
    A = A + 4.0 * np.eye(n)
    x_true = RNG.standard_normal(n) + 1j * RNG.standard_normal(n)
    b = A @ x_true
    sol, info = krylov.lsqr(A, b, tol=1e-12, maxiter=400)
    assert info.success
    np.testing.assert_allclose(np.asarray(sol), x_true, atol=1e-7)


def test_lsqr_backends_agree():
    m, n = 100, 40
    A = RNG.standard_normal((m, n))
    b = RNG.standard_normal(m)
    sol_e, info_e = krylov.lsqr(A, b, tol=1e-8, maxiter=200)
    sol_w, info_w = krylov.lsqr(
        A, b, tol=1e-8, maxiter=200, backend="while_loop"
    )
    assert info_e.success and info_w.success
    assert info_w.numsteps == info_e.numsteps
    np.testing.assert_allclose(
        np.asarray(sol_w), np.asarray(sol_e), atol=1e-10
    )
    m_ = min(len(info_e.resnorms), len(info_w.resnorms))
    np.testing.assert_allclose(
        info_w.resnorms[:m_], info_e.resnorms[:m_], rtol=1e-10, atol=1e-13
    )


def test_lsqr_callback_and_x0():
    n = 40
    A = np.diag(np.linspace(1.0, 3.0, n))
    b = np.ones(n)
    counts = []
    sol, info = krylov.lsqr(
        A, b, tol=1e-10, maxiter=200,
        callback=lambda x, r: counts.append(np.linalg.norm(np.asarray(r))),
    )
    assert info.success
    assert len(counts) == info.numsteps + 1
    # callback residual r = phibar * u tracks the true residual
    r_true = np.linalg.norm(b - A @ np.asarray(sol))
    assert counts[-1] == pytest.approx(max(r_true, 1e-15), rel=1e-6, abs=1e-9)

    # warm start from a partial solve continues to the same solution
    x_half = np.asarray(sol) * 0.5
    sol2, info2 = krylov.lsqr(A, b, x0=x_half, tol=1e-10, maxiter=200)
    assert info2.success
    np.testing.assert_allclose(np.asarray(sol2), np.asarray(sol), atol=1e-8)


def test_lsqr_unconverged_returns_none():
    m, n = 60, 30
    A = RNG.standard_normal((m, n))
    b = RNG.standard_normal(m)
    sol, info = krylov.lsqr(A, b, tol=1e-14, atol=0.0, maxiter=2)
    assert sol is None and not info.success
    assert info.xk is not None


def test_lsqr_zero_rhs():
    A = np.eye(20)
    sol, info = krylov.lsqr(A, np.zeros(20))
    assert info.success
    np.testing.assert_allclose(np.asarray(sol), 0.0)
