"""GMRES(m) restarts — build-side extension (the reference has none)."""

import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu


def _problem(n=60, seed=0):
    rng = np.random.default_rng(seed)
    A = np.diag(np.linspace(1.0, 50.0, n)) + 0.3 * rng.standard_normal((n, n))
    b = rng.standard_normal(n)
    return A, b


@pytest.mark.parametrize("backend", ["eager", "while_loop"])
def test_restarted_gmres_converges(backend):
    A, b = _problem()
    sol, info = krylov_tpu.gmres(
        A, b, tol=1e-8, restart=15, maxiter=600, backend=backend
    )
    assert info.success
    r = b - A @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-8 * (1 + np.linalg.norm(b)) * 10
    # memory contract: took more iterations than one 15-dim cycle
    assert info.numsteps > 15
    assert info.resnorms.shape == (info.numsteps + 1,)


def test_restarted_matches_full_when_converging_within_cycle():
    A, b = _problem(30, 1)
    sol_f, info_f = krylov_tpu.gmres(A, b, tol=1e-10, maxiter=30)
    sol_r, info_r = krylov_tpu.gmres(A, b, tol=1e-10, restart=30, maxiter=30)
    assert info_f.success and info_r.success
    np.testing.assert_allclose(
        np.asarray(sol_r), np.asarray(sol_f), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        info_r.resnorms, info_f.resnorms, rtol=1e-8, atol=1e-12
    )


def test_restarted_criterion_uses_initial_residual():
    # with a huge x0 the restart residual differs from the initial one; the
    # convergence threshold must still come from the first cycle's resnorm0
    A, b = _problem(40, 2)
    sol, info = krylov_tpu.gmres(A, b, tol=1e-9, restart=10, maxiter=400)
    assert info.success
    crit = 1e-9 * info.resnorms[0]
    assert info.resnorms[-1] <= crit * (1 + 1e-12) + 1e-15


def test_restarted_unconverged_returns_none():
    A, b = _problem(50, 3)
    sol, info = krylov_tpu.gmres(A, b, tol=1e-14, atol=0.0, restart=5, maxiter=12)
    assert sol is None
    assert not info.success
    assert info.numsteps <= 12 + 4  # cycles are 5,5,2-cap


def test_restarted_multi_rhs_per_column_criterion():
    """Restart cycles keep a per-RHS-column convergence criterion: a column
    whose initial residual is tiny must still converge relative to its own
    resnorm0, not to the largest column's (round-1 advisor finding)."""
    A, b0 = _problem(40, 2)
    # column 1 scaled down 1e6: under a max-collapsed criterion it would be
    # declared converged almost immediately
    B = np.stack([b0, 1e-6 * b0[::-1]], axis=1)
    tol = 1e-8
    sol, info = krylov_tpu.gmres(A, B, tol=tol, restart=12, maxiter=400)
    assert info.success
    R = B - A @ np.asarray(sol)
    for j in range(B.shape[1]):
        rel = np.linalg.norm(R[:, j]) / np.linalg.norm(B[:, j])
        assert rel <= tol * 50, (j, rel)


def test_restart_with_compiled_householder():
    """GMRES(m) cycles compose with the compiled householder ortho."""
    import numpy as np

    rng = np.random.default_rng(5)
    n = 40
    A = np.diag(np.arange(2.0, 2.0 + n)) + 0.4 * rng.standard_normal((n, n))
    b = np.ones(n)
    sol, info = krylov_tpu.gmres(
        A, b, ortho="householder", restart=8, tol=1e-9, maxiter=200,
        backend="while_loop",
    )
    assert info.success
    r = b - A @ np.asarray(info.xk)
    assert np.linalg.norm(r) <= 1e-8 * (1 + np.linalg.norm(b))
