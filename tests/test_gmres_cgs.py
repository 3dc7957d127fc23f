"""GMRES with classical-Gram-Schmidt orthogonalization (``ortho="cgs"``).

Build-side extension beyond the reference's {mgs, mgsN, householder} set
(reference: src/krylov/gmres.py:147-162): each CGS sweep is one batched Gram
contraction + one basis combination, so the sharded solve pays ONE psum per
sweep instead of k+1.  These tests pin

* convergence + Info consistency on representative zoo problems,
* eager/while_loop backend agreement,
* CGS2 orthogonality at MGS level (single-pass CGS documented looser),
* custom inner products and multi-RHS blocking,
* the restarted GMRES(m) path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from . import helpers
from . import linear_problems as lp


def _problems():
    return {
        "spd_dense": lp.spd_dense((5,)),
        "real_unsymmetric": lp.real_unsymmetric(),
        "complex_unsymmetric": lp.complex_unsymmetric(),
        "hermitian_indefinite": lp.hermitian_indefinite(),
    }


@pytest.mark.parametrize("pname", sorted(_problems().keys()))
@pytest.mark.parametrize("ortho", ["cgs", "cgs1"])
@pytest.mark.parametrize("backend", ["eager", "while_loop"])
def test_zoo_convergence(pname, ortho, backend):
    A, b = _problems()[pname]
    sol, info = krylov_tpu.gmres(
        A, b, ortho=ortho, tol=1e-7, maxiter=10, backend=backend
    )
    helpers.assert_consistent(A, b, info, sol, 1e-7)
    assert info.success


@pytest.mark.parametrize("shape", [(5,), (5, 1), (5, 3)])
def test_multi_rhs_blocking(shape):
    A, _ = lp.spd_dense((5,))
    rng = np.random.default_rng(0)
    b = rng.standard_normal(shape)
    sol, info = krylov_tpu.gmres(
        A, b, ortho="cgs", tol=1e-8, maxiter=10, backend="while_loop"
    )
    helpers.assert_consistent(A, b, info, sol, 1e-8)
    assert np.shape(info.resnorms) == (info.numsteps + 1,) + shape[1:]


def test_backends_agree_trajectory():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((40, 40)) + 40 * np.eye(40)
    b = rng.standard_normal(40)
    _, eager = krylov_tpu.gmres(
        A, b, ortho="cgs", tol=1e-10, maxiter=35, backend="eager"
    )
    _, comp = krylov_tpu.gmres(
        A, b, ortho="cgs", tol=1e-10, maxiter=35, backend="while_loop"
    )
    assert eager.numsteps == comp.numsteps
    np.testing.assert_allclose(
        np.asarray(eager.resnorms), np.asarray(comp.resnorms),
        rtol=1e-12, atol=1e-14,
    )


def test_cgs2_orthogonality_matches_mgs():
    """CGS2 ('twice is enough') keeps the basis orthonormal at MGS level."""
    rng = np.random.default_rng(2)
    A = np.diag(np.logspace(-8, 0, 40)) + 0.1 * rng.standard_normal((40, 40))
    v = rng.standard_normal(40)

    def orth_err(process):
        for _ in range(30):
            next(process)
        V = np.stack([np.asarray(x) for x in process.V], axis=1)
        return np.linalg.norm(np.eye(V.shape[1]) - V.conj().T @ V)

    err_mgs = orth_err(krylov_tpu.ArnoldiMGS(A, v))
    err_cgs2 = orth_err(krylov_tpu.ArnoldiCGS(A, v, num_passes=2))
    eps = np.finfo(np.float64).eps
    assert err_cgs2 <= max(10 * err_mgs, 100 * eps)


def test_custom_inner():
    rng = np.random.default_rng(3)
    A = rng.standard_normal((30, 30)) + 30 * np.eye(30)
    b = rng.standard_normal(30)
    w = 1.0 + rng.random(30)

    def inner(x, y):
        ww = jnp.reshape(jnp.asarray(w), (30,) + (1,) * (x.ndim - 1))
        return jnp.einsum("i...,i...->...", jnp.conj(x) * ww, y)

    for backend in ("eager", "while_loop"):
        sol, info = krylov_tpu.gmres(
            A, b, ortho="cgs", inner=inner, tol=1e-9, maxiter=28,
            backend=backend,
        )
        assert info.success
        r = np.asarray(b) - A @ np.asarray(info.xk)
        assert np.linalg.norm(r) <= 1e-7 * (1 + np.linalg.norm(b))


def test_preconditioned():
    A, b = lp.spd_sparse((5,))
    M = np.diag(1.0 / np.asarray(A.diagonal()))
    for backend in ("eager", "while_loop"):
        sol, info = krylov_tpu.gmres(
            A, b, M=M, ortho="cgs", tol=1e-8, maxiter=10, backend=backend
        )
        assert info.success
        r = np.asarray(b) - A @ np.asarray(info.xk)
        assert np.linalg.norm(r) <= 1e-6 * (1 + np.linalg.norm(np.asarray(b)))


def test_restarted_cgs():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((50, 50)) + 50 * np.eye(50)
    b = rng.standard_normal(50)
    sol, info = krylov_tpu.gmres(
        A, b, ortho="cgs", restart=8, tol=1e-9, backend="while_loop"
    )
    assert info.success
    r = np.asarray(b) - A @ np.asarray(info.xk)
    assert np.linalg.norm(r) <= 1e-7 * (1 + np.linalg.norm(b))


def test_unknown_ortho_rejected():
    A, b = lp.spd_dense((5,))
    with pytest.raises(ValueError):
        krylov_tpu.gmres(A, b, ortho="qr", backend="while_loop")
