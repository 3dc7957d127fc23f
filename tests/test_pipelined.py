"""Pipelined (single-reduction) CG: trajectory parity with standard CG and
distributed operation with one fused psum per iteration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.ops import stencil


def _spd(n=60, seed=0):
    rng = np.random.default_rng(seed)
    Q = rng.standard_normal((n, n))
    return Q @ Q.T + n * np.eye(n)


def test_pipelined_matches_cg_trajectory():
    A = _spd()
    b = np.random.default_rng(1).standard_normal(60)
    sol_p, info_p = krylov_tpu.cg_pipelined(A, b, tol=1e-10, maxiter=120)
    sol_c, info_c = krylov_tpu.cg(A, b, tol=1e-10, maxiter=120)
    assert info_p.success
    # same Krylov space: step counts within a couple of iterations and the
    # solutions coincide
    assert abs(info_p.numsteps - info_c.numsteps) <= 3
    np.testing.assert_allclose(
        np.asarray(sol_p), np.asarray(sol_c), rtol=1e-7, atol=1e-9
    )
    # early trajectory matches standard CG closely (identical recurrences
    # in exact arithmetic)
    m = min(6, len(info_p.resnorms), len(info_c.resnorms))
    np.testing.assert_allclose(
        np.asarray(info_p.resnorms[:m]), np.asarray(info_c.resnorms[:m]),
        rtol=1e-6,
    )


def test_pipelined_preconditioned():
    n = 80
    d = np.linspace(1.0, 500.0, n)
    rng = np.random.default_rng(2)
    A = np.diag(d) + 0.01 * rng.standard_normal((n, n))
    A = (A + A.T) / 2
    b = rng.standard_normal(n)
    M = np.diag(1.0 / d)
    sol, info = krylov_tpu.cg_pipelined(A, b, M=M, tol=1e-9, maxiter=n)
    _, info_n = krylov_tpu.cg_pipelined(A, b, tol=1e-9, maxiter=n)
    assert info.success
    r = b - A @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-7 * (1 + np.linalg.norm(b))
    assert info.numsteps <= info_n.numsteps


@pytest.mark.parametrize("backend", ["eager", "while_loop"])
def test_pipelined_backends_agree(backend):
    A = _spd(40, 3)
    b = np.random.default_rng(4).standard_normal(40)
    sol, info = krylov_tpu.cg_pipelined(
        A, b, tol=1e-9, maxiter=80, backend=backend
    )
    assert info.success
    r = b - A @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-7 * (1 + np.linalg.norm(b))


def test_pipelined_residual_replacement_restores_accuracy():
    """With replacement disabled the recurrence residual can drift; the
    periodic explicit replacement keeps the reported and true residuals
    together at convergence."""
    A = _spd(100, 5)
    b = np.random.default_rng(6).standard_normal(100)
    sol, info = krylov_tpu.cg_pipelined(
        A, b, tol=1e-11, maxiter=400, replace_every=25
    )
    assert info.success
    r = np.linalg.norm(b - A @ np.asarray(sol))
    assert r <= 1e-9 * (1 + np.linalg.norm(b))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pipelined_sharded_single_psum():
    from krylov_tpu import parallel

    A = stencil.poisson_2d(8, 16)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.standard_normal(128))
    sol_ref, info_ref = krylov_tpu.cg(A, b, tol=1e-8, maxiter=300)
    sol, info = parallel.sharded_solve(
        krylov_tpu.cg_pipelined, A, b,
        mesh=parallel.make_mesh(n_rows=8), tol=1e-8, maxiter=300,
    )
    assert info.success
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_pipelined_sharded_multi_rhs():
    """The injected fused psum must contract vector axes only, keeping
    per-column scalars for blocked RHS."""
    from krylov_tpu import parallel

    A = stencil.poisson_2d(8, 16)
    rng = np.random.default_rng(11)
    B = jnp.asarray(rng.standard_normal((128, 2)))
    sol_ref, info_ref = krylov_tpu.cg_pipelined(A, B, tol=1e-8, maxiter=300)
    sol, info = parallel.sharded_solve(
        krylov_tpu.cg_pipelined, A, B,
        mesh=parallel.make_mesh(n_rows=8), tol=1e-8, maxiter=300,
    )
    assert info.success
    assert info.resnorms.shape[1:] == (2,)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               atol=1e-6)
