"""Sharded ILU(0)-Schwarz (parallel/schwarz.py) over 8 virtual devices.

No reference counterpart (the reference ships neither preconditioners nor a
distribution layer — reference: src/krylov/cg.py:33-36, SURVEY.md §2.3).
The apply is shard-local, so the `as_global()` twin is EXACT (vmapped same
sweeps), pinned here against both a host spsolve_triangular computation and
the sharded solve trajectory."""

import numpy as np
import pytest
import scipy.sparse
import scipy.sparse.linalg

import krylov_tpu
from krylov_tpu.ilu import _ilu0_factor
from krylov_tpu.parallel import make_mesh, partition_ilu0, sharded_solve
from krylov_tpu.parallel.csr import pad_unit_diagonal


def _convection_diffusion(n=31, pe=20.0):
    h = 1.0 / (n + 1)
    T = scipy.sparse.diags(
        [-1 - pe * h / 2, 2.0, -1 + pe * h / 2], [-1, 0, 1], shape=(n, n)
    )
    I = scipy.sparse.identity(n)
    return (scipy.sparse.kron(I, T) + scipy.sparse.kron(T, I)).tocsr()


A = _convection_diffusion()  # N = 961, pads to 968 over 8 shards
N = A.shape[0]
RNG = np.random.default_rng(5)
B1 = RNG.standard_normal(N)


def test_global_twin_matches_host_block_solves():
    part = partition_ilu0(A, 8, with_rmatvec=True)
    pad = part.n_pad - N
    A_pad = pad_unit_diagonal(A, pad)
    b_pad = np.concatenate([B1, np.zeros(pad)])
    z_dev = np.asarray(part.as_global() @ b_pad)
    n_loc = part.n_local_fine
    z_ref = np.empty(part.n_pad)
    for s in range(8):
        r0 = s * n_loc
        blk = A_pad[r0 : r0 + n_loc, r0 : r0 + n_loc].tocsr()
        L, U = _ilu0_factor(blk)
        y = scipy.sparse.linalg.spsolve_triangular(
            L.tocsr(), b_pad[r0 : r0 + n_loc], lower=True
        )
        z_ref[r0 : r0 + n_loc] = scipy.sparse.linalg.spsolve_triangular(
            U.tocsr(), y, lower=False
        )
    np.testing.assert_allclose(z_dev, z_ref, rtol=1e-12, atol=1e-14)
    # adjoint identity
    u = RNG.standard_normal(part.n_pad)
    v = RNG.standard_normal(part.n_pad)
    tw = part.as_global()
    lhs = np.dot(u, np.asarray(tw @ v))
    rhs = np.dot(np.asarray(tw.rmatvec(u)), v)
    assert abs(lhs - rhs) < 1e-10 * (1 + abs(lhs))


def test_sharded_bicgstab_matches_twin_trajectory():
    part = partition_ilu0(A, 8)
    _, i_plain = sharded_solve(
        krylov_tpu.bicgstab, A, B1, mesh=make_mesh(8), tol=1e-8,
        maxiter=2 * N,
    )
    sol, info = sharded_solve(
        krylov_tpu.bicgstab, A, B1, mesh=make_mesh(8), tol=1e-8,
        M_partition=part, maxiter=200,
    )
    assert info.success
    assert info.numsteps * 2 < i_plain.numsteps
    x_ref = scipy.sparse.linalg.spsolve(A.tocsc(), B1)
    assert np.max(np.abs(np.asarray(sol) - x_ref)) < 1e-5

    pad = part.n_pad - N
    A_pad = pad_unit_diagonal(A, pad)
    b_pad = np.concatenate([B1, np.zeros(pad)])
    _, info_tw = krylov_tpu.bicgstab(
        A_pad, b_pad, tol=1e-8, Ml=part.as_global(),
        backend="while_loop", maxiter=200,
    )
    assert info_tw.numsteps == info.numsteps
    np.testing.assert_allclose(
        np.asarray(info.resnorms), np.asarray(info_tw.resnorms), rtol=1e-6
    )


def test_sharded_qmr_uses_adjoint_and_multirhs_gmres():
    part = partition_ilu0(A, 8, with_rmatvec=True)
    _, info_q = sharded_solve(
        krylov_tpu.qmr, A, B1, mesh=make_mesh(8), tol=1e-8,
        M_partition=part, maxiter=200,
    )
    assert info_q.success
    # blocked RHS through the same sweeps (gmres takes Ml)
    Bk = RNG.standard_normal((N, 2))
    sol, info_g = sharded_solve(
        krylov_tpu.gmres, A, Bk, mesh=make_mesh(8), tol=1e-8,
        M_partition=part, maxiter=100,
    )
    assert info_g.success
    X_ref = scipy.sparse.linalg.spsolve(A.tocsc(), Bk)
    assert np.max(np.abs(np.asarray(sol) - X_ref)) < 1e-5


def test_adjoint_refused_without_flag():
    part = partition_ilu0(A, 8)  # no with_rmatvec
    with pytest.raises(Exception, match="with_rmatvec"):
        sharded_solve(
            krylov_tpu.qmr, A, B1, mesh=make_mesh(8), tol=1e-8,
            M_partition=part, maxiter=50,
        )


def test_spd_ilu_schwarz_preconditions_cg():
    """Per-shard ILU(0) of SPD diagonal blocks is L D L^T per block
    (IC(0) equivalence), so the Schwarz partition is a valid CG M."""
    S = _convection_diffusion(pe=0.0)  # SPD Poisson
    part = partition_ilu0(S, 8)
    b = RNG.standard_normal(S.shape[0])
    _, i_plain = sharded_solve(
        krylov_tpu.cg, S, b, mesh=make_mesh(8), tol=1e-8, maxiter=2000
    )
    sol, info = sharded_solve(
        krylov_tpu.cg, S, b, mesh=make_mesh(8), tol=1e-8,
        M_partition=part, maxiter=500,
    )
    assert info.success
    # 8 subdomains on a 961-row grid: ~2x fewer iterations (the gain
    # grows with subdomain size; see test_ilu.py for the 1-domain case)
    assert info.numsteps < 0.6 * i_plain.numsteps
    x_ref = scipy.sparse.linalg.spsolve(S.tocsc(), b)
    assert np.max(np.abs(np.asarray(sol) - x_ref)) < 1e-6
