"""Block-Jacobi preconditioner (batched dense block inverses).

Extension beyond the reference (no preconditioners there — reference:
src/krylov/cg.py:33-36).  Pinned against the explicit block-diagonal
inverse, against the anisotropic line-Jacobi win, and (sharded) against
the collective-free single-device twin."""

import numpy as np
import pytest
import scipy.linalg
import scipy.sparse
import scipy.sparse.linalg

import krylov_tpu
from krylov_tpu import BlockJacobiPreconditioner
from krylov_tpu.parallel import (
    make_mesh,
    partition_block_jacobi,
    sharded_solve,
)
from krylov_tpu.parallel.csr import pad_unit_diagonal

N_SIDE = 31


def _aniso(n=N_SIDE, eps=100.0):
    I = scipy.sparse.identity(n, dtype=np.float64)
    T = scipy.sparse.diags(
        [-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n), dtype=np.float64
    )
    return (
        scipy.sparse.kron(I, eps * T) + scipy.sparse.kron(T, I)
    ).tocsr()


A = _aniso()
N = A.shape[0]
B1 = np.random.default_rng(3).standard_normal(N)


def test_matches_explicit_block_diagonal_inverse():
    M = BlockJacobiPreconditioner.from_scipy(A, block=N_SIDE)
    _, info = krylov_tpu.cg(A, B1, tol=1e-8, M=M, backend="while_loop")
    blocks = [
        np.linalg.inv(
            A[i * N_SIDE : (i + 1) * N_SIDE,
              i * N_SIDE : (i + 1) * N_SIDE].toarray()
        )
        for i in range(N_SIDE)
    ]
    _, info_ref = krylov_tpu.cg(
        A, B1, tol=1e-8, M=scipy.linalg.block_diag(*blocks)
    )
    assert info.numsteps == info_ref.numsteps
    # rtol floor set by the final (explicit-residual) entry at ~1e-8 scale,
    # where einsum-vs-dense reduction order shows through
    np.testing.assert_allclose(
        np.asarray(info.resnorms), np.asarray(info_ref.resnorms), rtol=1e-6
    )


def test_line_blocks_beat_point_jacobi_on_anisotropy():
    """block = ny -> line Jacobi: exact solves along the strongly coupled
    direction, which pointwise Jacobi cannot see at all."""
    _, info_pt = krylov_tpu.cg(
        A, B1, tol=1e-8, M=krylov_tpu.jacobi_preconditioner(A),
        maxiter=3000,
    )
    M = BlockJacobiPreconditioner.from_scipy(A, block=N_SIDE)
    sol, info = krylov_tpu.cg(A, B1, tol=1e-8, M=M, backend="while_loop")
    assert info.success
    assert info.numsteps * 4 < info_pt.numsteps
    x_ref = scipy.sparse.linalg.spsolve(A.tocsc(), B1)
    assert np.max(np.abs(np.asarray(sol) - x_ref)) < 1e-6


def test_ragged_tail_block_and_multirhs():
    """N not a block multiple: the trailing block zero-pads internally
    (identity on the pad), and blocked right-hand sides ride the same
    batched einsum."""
    M = BlockJacobiPreconditioner.from_scipy(A, block=64)  # 961 % 64 != 0
    Bk = np.random.default_rng(4).standard_normal((N, 3))
    sol, info = krylov_tpu.cg(A, Bk, tol=1e-8, M=M, backend="while_loop")
    assert info.success
    X_ref = scipy.sparse.linalg.spsolve(A.tocsc(), Bk)
    assert np.max(np.abs(np.asarray(sol) - X_ref)) < 1e-6


def test_sharded_matches_global_twin():
    part = partition_block_jacobi(A, 8, block=11)  # n_local = 968/8 = 121
    _, info_sh = sharded_solve(
        krylov_tpu.cg, A, B1, mesh=make_mesh(8), tol=1e-8,
        M_partition=part,
    )
    assert info_sh.success
    pad = part.n_pad - N
    A_pad = pad_unit_diagonal(A, pad)
    b_pad = np.concatenate([B1, np.zeros(pad)])
    _, info_tw = krylov_tpu.cg(
        A_pad, b_pad, tol=1e-8, M=part.as_global(), backend="while_loop"
    )
    assert info_tw.numsteps == info_sh.numsteps
    np.testing.assert_allclose(
        np.asarray(info_sh.resnorms), np.asarray(info_tw.resnorms),
        rtol=1e-6,
    )


def test_partition_validation():
    with pytest.raises(ValueError, match="divisor"):
        partition_block_jacobi(A, 8, block=13)  # 121 % 13 != 0
    with pytest.raises(ValueError, match="square"):
        BlockJacobiPreconditioner.from_scipy(
            scipy.sparse.random(8, 5, density=0.5, format="csr")
        )
