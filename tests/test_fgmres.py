"""Flexible GMRES: per-iteration-varying (inner-iterative) preconditioners."""

import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.ops import stencil

from .helpers import assert_consistent


def _unsym(n=80, seed=0):
    rng = np.random.default_rng(seed)
    return (
        np.diag(np.linspace(1.0, 60.0, n)) + 0.4 * rng.standard_normal((n, n)),
        rng.standard_normal(n),
    )


def test_fgmres_matches_gmres_unpreconditioned():
    A, b = _unsym()
    sol_f, info_f = krylov_tpu.fgmres(A, b, tol=1e-10, maxiter=80)
    sol_g, info_g = krylov_tpu.gmres(A, b, tol=1e-10, maxiter=80)
    assert info_f.success
    np.testing.assert_allclose(
        np.asarray(sol_f), np.asarray(sol_g), rtol=1e-7, atol=1e-9
    )
    # identical Krylov process without M: trajectories coincide (the final
    # explicit-residual entries sit at the rounding floor)
    m = min(len(info_f.resnorms), len(info_g.resnorms))
    np.testing.assert_allclose(
        info_f.resnorms[:m], np.asarray(info_g.resnorms)[:m],
        rtol=1e-8, atol=1e-13,
    )
    assert_consistent(A, b, info_f, sol_f, 1e-10)


def test_fgmres_with_inner_cg_preconditioner():
    """The flexible capability: an ITERATIVE solver as the preconditioner
    (different operator applied every iteration — plain GMRES theory does
    not cover this; FGMRES is built for it)."""
    A = stencil.poisson_2d(16, 16)
    rng = np.random.default_rng(1)
    b = rng.standard_normal(256)

    def inner_cg(v):
        _, info = krylov_tpu.cg(A, jnp.asarray(v), tol=1e-2, maxiter=8)
        return info.xk

    sol, info = krylov_tpu.fgmres(A, b, M=inner_cg, tol=1e-8, maxiter=60)
    _, info_plain = krylov_tpu.fgmres(A, b, tol=1e-8, maxiter=200)
    assert info.success
    assert info.numsteps * 3 <= info_plain.numsteps
    r = b - np.asarray(A @ jnp.asarray(sol))
    assert np.linalg.norm(r) <= 1e-6 * (1 + np.linalg.norm(b))


def test_fgmres_restarted_and_varying_M():
    A, b = _unsym(60, 2)
    d = np.abs(np.diag(A)) + 1.0

    def M(j, v):  # iteration-indexed preconditioner
        scale = 1.0 / d if j % 2 == 0 else 1.0 / np.sqrt(d)
        return jnp.asarray(scale) * v

    sol, info = krylov_tpu.fgmres(A, b, M=M, tol=1e-8, restart=15,
                                  maxiter=300)
    assert info.success
    r = b - A @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-6 * (1 + np.linalg.norm(b))


def test_fgmres_unconverged_returns_none():
    A, b = _unsym(40, 3)
    sol, info = krylov_tpu.fgmres(A, b, tol=1e-14, maxiter=3)
    assert sol is None and not info.success
    assert len(info.resnorms) == info.numsteps + 1


def test_fgmres_callback_contract():
    """callback fires once before the loop plus once per iteration
    (reference contract: count == numsteps + 1)."""
    A, b = _unsym(30, 5)
    calls = []
    sol, info = krylov_tpu.fgmres(
        A, b, tol=1e-8, maxiter=30,
        callback=lambda x, r: calls.append(np.linalg.norm(np.asarray(r))),
    )
    assert len(calls) == info.numsteps + 1
