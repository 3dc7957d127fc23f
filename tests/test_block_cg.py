"""Block CG: shared-Krylov multi-RHS acceleration (extension beyond the
reference's independent-column blocking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.ops import stencil

from .helpers import assert_consistent


def _outlier_spd(n=100):
    return np.diag([1e-3, 2e-3, 5e-3] + list(np.linspace(1.0, 10.0, n - 3)))


def test_block_cg_beats_columnwise_on_outlier_spectrum():
    A = _outlier_spd()
    rng = np.random.default_rng(0)
    B = rng.standard_normal((100, 3))
    sol_b, info_b = krylov_tpu.cg_block(A, B, tol=1e-9, maxiter=200)
    sol_c, info_c = krylov_tpu.cg(A, B, tol=1e-9, maxiter=400)
    assert info_b.success and info_c.success
    # the 3-column block absorbs the 3 outlier eigenvalues
    assert info_b.numsteps < info_c.numsteps
    R = B - A @ np.asarray(sol_b)
    assert np.max(np.linalg.norm(R, axis=0)) <= 1e-7
    # consistency contract (resnorm shapes, aliasing, explicit residual)
    assert_consistent(A, B, info_b, sol_b, 1e-9)


def test_block_cg_single_rhs_and_preconditioned():
    A = _outlier_spd(60)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(60)
    sol, info = krylov_tpu.cg_block(A, b, tol=1e-9, maxiter=200)
    assert info.success
    assert np.asarray(sol).shape == (60,)
    assert_consistent(A, b, info, sol, 1e-9)

    B = rng.standard_normal((60, 2))
    M = np.diag(1.0 / np.diag(A))
    sol_p, info_p = krylov_tpu.cg_block(A, B, M=M, tol=1e-9, maxiter=200)
    assert info_p.success
    _, info_n = krylov_tpu.cg_block(A, B, tol=1e-9, maxiter=200)
    assert info_p.numsteps <= info_n.numsteps


@pytest.mark.parametrize("backend", ["eager", "while_loop"])
def test_block_cg_backends_agree(backend):
    A = _outlier_spd(50)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((50, 2))
    sol, info = krylov_tpu.cg_block(A, B, tol=1e-9, maxiter=120,
                                    backend=backend)
    assert info.success
    R = B - A @ np.asarray(sol)
    assert np.max(np.linalg.norm(R, axis=0)) <= 1e-7


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_block_cg_sharded():
    from krylov_tpu import parallel

    A = stencil.poisson_2d(8, 16)
    rng = np.random.default_rng(3)
    B = jnp.asarray(rng.standard_normal((128, 3)))
    sol_ref, info_ref = krylov_tpu.cg_block(A, B, tol=1e-8, maxiter=300)
    sol, info = parallel.sharded_solve(
        krylov_tpu.cg_block, A, B,
        mesh=parallel.make_mesh(n_rows=8), tol=1e-8, maxiter=300,
    )
    assert info.success
    assert info.numsteps == info_ref.numsteps
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               atol=1e-6)


def test_block_cg_complex_hpd():
    """Complex HPD systems (the reference zoo's hpd family) converge to
    tight tolerance; the relative ridge must not create an absolute
    accuracy floor near convergence."""
    rng = np.random.default_rng(9)
    n = 40
    Q = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    A = Q @ Q.conj().T + n * np.eye(n)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    B = np.stack([b, b[::-1]], axis=1)
    sol, info = krylov_tpu.cg_block(A, B, tol=1e-10, maxiter=120)
    assert info.success
    R = B - A @ np.asarray(sol)
    assert np.max(np.abs(R)) <= 1e-8


def test_block_cg_f32_dependent_columns():
    """In f32 the ridge must scale with the dtype epsilon: exactly
    rank-deficient Gram matrices (duplicate RHS columns) may not produce
    NaNs on the first iteration."""
    A = _outlier_spd(48).astype(np.float32)
    rng = np.random.default_rng(12)
    col = rng.standard_normal(48).astype(np.float32)
    B = np.stack([col, col], axis=1)  # identical columns: rank-1 block
    sol, info = krylov_tpu.cg_block(
        jnp.asarray(A), jnp.asarray(B), tol=1e-4, maxiter=200
    )
    assert np.all(np.isfinite(np.asarray(info.xk)))
    assert info.success
    R = B - A @ np.asarray(info.xk)
    assert np.max(np.linalg.norm(R, axis=0)) <= 1e-2
