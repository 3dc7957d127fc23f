"""ILU preconditioner (spilu factors on level-scheduled sweeps).

Extension beyond the reference (no preconditioners there — reference:
src/krylov/cg.py:33-36).  Apply semantics are pinned bit-for-bit against
``SuperLU.solve``; the solver-side win is pinned on a convection-diffusion
problem (nonsymmetric, ILU's home turf)."""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import krylov_tpu
from krylov_tpu import ILUPreconditioner


def _convection_diffusion(n=24, pe=20.0):
    h = 1.0 / (n + 1)
    T = scipy.sparse.diags(
        [-1 - pe * h / 2, 2.0, -1 + pe * h / 2], [-1, 0, 1], shape=(n, n)
    )
    I = scipy.sparse.identity(n)
    return (scipy.sparse.kron(I, T) + scipy.sparse.kron(T, I)).tocsr()


A = _convection_diffusion()
N = A.shape[0]
RNG = np.random.default_rng(11)
B1 = RNG.standard_normal(N)


def test_ilut_apply_matches_superlu_solve():
    ilu = scipy.sparse.linalg.spilu(A.tocsc())
    M = ILUPreconditioner.from_scipy(A, method="ilut")
    np.testing.assert_allclose(
        np.asarray(M @ B1), ilu.solve(B1), rtol=1e-12, atol=1e-14
    )
    # multi-RHS rides the same sweeps
    Bk = RNG.standard_normal((N, 3))
    Zk = np.asarray(M @ Bk)
    for j in range(3):
        np.testing.assert_allclose(
            Zk[:, j], ilu.solve(Bk[:, j]), rtol=1e-12, atol=1e-14
        )


def test_ilu0_defining_property():
    """ILU(0): (LU)_ij == A_ij exactly on the sparsity pattern of A, and
    the factor wavefront equals the grid wavefront (shallow levels)."""
    from krylov_tpu.ilu import _ilu0_factor

    L, U = _ilu0_factor(A)
    mask = A.copy()
    mask.data = np.ones_like(mask.data)
    diff = (L @ U).multiply(mask) - A
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-12
    M = ILUPreconditioner.from_scipy(A)
    assert max(M.nlevels) == 2 * 24 - 1  # 2*sqrt(N) - 1 wavefront


def test_rmatvec_is_the_adjoint():
    M = ILUPreconditioner.from_scipy(A, with_rmatvec=True)
    u, v = RNG.standard_normal(N), RNG.standard_normal(N)
    lhs = np.dot(u, np.asarray(M @ v))
    rhs = np.dot(np.asarray(M.rmatvec(u)), v)
    assert abs(lhs - rhs) < 1e-10 * (1 + abs(lhs))
    # without the flag, the adjoint is refused with a clear error
    M0 = ILUPreconditioner.from_scipy(A)
    with pytest.raises(ValueError, match="with_rmatvec"):
        M0.rmatvec(u)


def test_left_preconditions_nonsymmetric_family():
    M = ILUPreconditioner.from_scipy(A, with_rmatvec=True)
    _, i_plain = krylov_tpu.gmres(A, B1, tol=1e-8, maxiter=N)
    x_ref = scipy.sparse.linalg.spsolve(A.tocsc(), B1)
    for solver in (krylov_tpu.gmres, krylov_tpu.bicgstab, krylov_tpu.qmr):
        sol, info = solver(
            A, B1, tol=1e-8, Ml=M, maxiter=100, backend="while_loop"
        )
        assert info.success, solver.__name__
        assert info.numsteps * 2 < i_plain.numsteps, solver.__name__
        assert np.max(np.abs(np.asarray(sol) - x_ref)) < 1e-5


def test_ilu0_is_spd_preconditioner_for_cg():
    """On SPD input the no-pivot exact-pattern factorization is exactly
    L D L^T (the IC(0) equivalence), so ilu0 is a valid CG ``M``."""
    from krylov_tpu.ilu import _ilu0_factor

    S = _convection_diffusion(pe=0.0)  # plain SPD Poisson
    L, U = _ilu0_factor(S)
    P = (L @ U).toarray()
    assert np.abs(P - P.T).max() < 1e-12
    b = RNG.standard_normal(S.shape[0])
    _, i_j = krylov_tpu.cg(
        S, b, tol=1e-8, M=krylov_tpu.jacobi_preconditioner(S)
    )
    M = ILUPreconditioner.from_scipy(S)
    sol, i_ic = krylov_tpu.cg(S, b, tol=1e-8, M=M, backend="while_loop")
    assert i_ic.success
    assert i_ic.numsteps * 2 < i_j.numsteps
    x_ref = scipy.sparse.linalg.spsolve(S.tocsc(), b)
    assert np.max(np.abs(np.asarray(sol) - x_ref)) < 1e-6


def test_ilu0_complex_matrix_keeps_imaginary_part():
    """Complex matrices must route around the real-only native kernel:
    the ILU(0) defining property holds for complex data too."""
    from krylov_tpu.ilu import _ilu0_factor

    C = A.astype(np.complex128) + 1j * scipy.sparse.diags(
        0.1 * np.ones(N - 1), 1, shape=(N, N)
    ).tocsr()
    C = C.tocsr()
    L, U = _ilu0_factor(C)
    mask = C.copy()
    mask.data = np.ones_like(mask.data)
    diff = (L @ U).multiply(mask) - C
    assert (np.abs(diff.data).max() if diff.nnz else 0.0) < 1e-12


def test_level_guard_refuses_deep_chains():
    with pytest.raises(NotImplementedError, match="levels"):
        ILUPreconditioner.from_scipy(A, max_levels=4)
