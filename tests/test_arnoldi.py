"""Arnoldi stability property tests.

Verifies the Drkosova–Greenbaum–Rozložník–Strakoš (BIT 1995) inequalities for
all three orthogonalization processes, parametrized over matrix types × start
vectors × maxiter × M × inner — the same property-test mode as the reference
(reference: tests/test_arnoldi.py:166-263).
"""

import numpy as np
import pytest
import scipy.linalg

import krylov_tpu as krylov

from .helpers import (
    get_matrix_comp_nonsymm,
    get_matrix_herm_indef,
    get_matrix_hpd,
    get_matrix_nonsymm,
    get_matrix_spd,
    get_matrix_symm_indef,
)

_B = np.diag(np.linspace(1.0, 5.0, 10))


def _unit_vec(n):
    x = np.zeros(n)
    x[0] = 1.0
    return x


def assert_arnoldi(
    A, v, V, H, P, maxiter, ortho, M, inner,
    lanczos=False, arnoldi_const=1, ortho_const=1, proj_const=10, An=None,
):
    N = v.shape[0]
    if An is None:
        An = np.linalg.norm(A, 2)
    eps = np.finfo(np.double).eps
    k = H.shape[1]

    assert k <= maxiter
    invariant = H.shape[0] == k
    assert len(V) == len(H)

    if P is None:
        P = V

    Mv = v if M is None else M @ v
    v1n = np.sqrt(inner(v, Mv))
    assert np.linalg.norm(np.asarray(P[0]) - v / v1n) <= 1.0e-14

    # upper Hessenberg, real non-negative subdiagonal
    assert np.all(np.tril(H, -2) == 0.0)
    d = np.diag(H[1:, :])
    assert np.all(np.abs(d.imag) < 1.0e-14)
    assert np.all(d.real >= 0.0)

    if lanczos:
        assert np.all(np.abs(H - H.T.conj()) < 1e-14)
        assert np.all(np.abs(H.imag) < 1e-14)

    V = np.column_stack([np.asarray(x) for x in V])
    P = np.column_stack([np.asarray(x) for x in P])

    # Arnoldi residual || M A V_k - V_{k+1} H || — inequality (2.3)
    AV = A @ V if invariant else A @ V[:, :-1]
    MAV = AV if M is None else M @ AV
    arnoldi_res = MAV - V @ H
    arnoldi_resnorm = np.linalg.norm(inner(arnoldi_res, arnoldi_res), 2)
    arnoldi_tol = arnoldi_const * k * (N**1.5) * eps * An
    assert arnoldi_resnorm <= arnoldi_tol

    # orthogonality || I - <V, P> || — inequalities (2.4) / (2.5)
    ortho_res = np.eye(V.shape[1]) - inner(V, P)
    ortho_resnorm = np.linalg.norm(ortho_res, 2)
    if ortho == "house":
        ortho_tol = ortho_const * (k**1.5) * N * eps
    else:
        vAV_singvals = scipy.linalg.svd(
            np.column_stack([V[:, [0]], (MAV[:, :-1] if invariant else MAV)]),
            compute_uv=False,
        )
        if vAV_singvals[-1] == 0:
            ortho_tol = np.inf
        else:
            ortho_tol = (
                ortho_const * (k**2) * N * eps * vAV_singvals[0] / vAV_singvals[-1]
            )
    if (ortho != "mgs" or N != k) and ortho != "lanczos":
        assert ortho_resnorm <= ortho_tol

    # projection residual || <P, M A V_k> - H ||
    proj_res = inner(P, MAV) - H
    proj_tol = proj_const * (
        ortho_resnorm * An
        + arnoldi_resnorm * np.sqrt(np.linalg.norm(inner(V, V), 2))
    )
    assert np.linalg.norm(proj_res, 2) <= np.max([proj_tol, eps])


@pytest.mark.parametrize(
    "A", [get_matrix_spd(), get_matrix_symm_indef(), get_matrix_nonsymm()]
)
@pytest.mark.parametrize("v", [np.ones(10), _unit_vec(10)])
@pytest.mark.parametrize("maxiter", [1, 5, 9, 10])
def test_arnoldi_householder(A, v, maxiter):
    An = np.linalg.norm(A, 2)
    arnoldi = krylov.ArnoldiHouseholder(A, v)
    h_columns = []
    while arnoldi.iter < maxiter and not arnoldi.is_invariant:
        _, h = next(arnoldi)
        h_columns.append(np.asarray(h))

    V = arnoldi.V
    H = np.zeros((arnoldi.iter + 1, arnoldi.iter), dtype=arnoldi.dtype)
    for k, val in enumerate(h_columns):
        H[: len(val), k] = val
    if arnoldi.is_invariant:
        H = H[:-1]

    def inner(x, y):
        return x.T.conj().dot(y)

    assert_arnoldi(A, v, V, H, V, maxiter, "house", None, inner, An=An)


@pytest.mark.parametrize(
    "A",
    [
        get_matrix_spd(),
        get_matrix_hpd(),
        get_matrix_symm_indef(),
        get_matrix_herm_indef(),
        get_matrix_nonsymm(),
        get_matrix_comp_nonsymm(),
    ],
)
@pytest.mark.parametrize("v", [np.ones(10), _unit_vec(10)])
@pytest.mark.parametrize("maxiter", [1, 5, 9, 10])
@pytest.mark.parametrize("M", [None, _B])
@pytest.mark.parametrize(
    "inner",
    [lambda x, y: x.T.conj().dot(y), lambda x, y: x.T.conj().dot(_B.dot(y))],
)
def test_arnoldi_mgs(A, v, maxiter, M, inner):
    An = np.linalg.norm(A, 2)
    arnoldi = krylov.ArnoldiMGS(A, v, M=M, inner=inner)
    h_columns = []
    while arnoldi.iter < maxiter and not arnoldi.is_invariant:
        _, h = next(arnoldi)
        h_columns.append(np.asarray(h))

    V, P = arnoldi.V, arnoldi.P
    H = np.zeros((arnoldi.iter + 1, arnoldi.iter), dtype=arnoldi.dtype)
    for k, val in enumerate(h_columns):
        H[: k + 2, k] = val
    if arnoldi.is_invariant:
        H = H[:-1]

    assert_arnoldi(A, v, V, H, P, maxiter, "mgs", M, inner, An=An)


@pytest.mark.parametrize(
    "A",
    [
        get_matrix_spd(),
        get_matrix_hpd(),
        get_matrix_symm_indef(),
        get_matrix_herm_indef(),
    ],
)
@pytest.mark.parametrize("v", [np.ones(10), _unit_vec(10)])
@pytest.mark.parametrize("maxiter", [1, 5, 9, 10])
@pytest.mark.parametrize("M", [None, _B])
@pytest.mark.parametrize(
    "inner",
    [lambda x, y: x.T.conj().dot(y), lambda x, y: x.T.conj().dot(_B.dot(y))],
)
def test_arnoldi_lanczos(A, v, maxiter, M, inner):
    An = np.linalg.norm(A, 2)
    v0 = v.copy()
    arnoldi = krylov.ArnoldiLanczos(A, v0, M=M, inner=inner)
    V = [np.asarray(arnoldi.v)]
    P = [np.asarray(arnoldi.p)]
    tridiag_H = []
    for _ in range(maxiter):
        if arnoldi.is_invariant:
            break
        vv, h, p = next(arnoldi)
        if vv is not None:
            V.append(np.asarray(vv))
        if p is not None:
            P.append(np.asarray(p))
        tridiag_H.append(np.asarray(h).copy())

    k = len(tridiag_H)
    H = np.zeros((k + 1, k), dtype=arnoldi.dtype)
    for i, vals in enumerate(tridiag_H):
        if i == 0:
            H[:2, i] = vals[1:]
        else:
            H[i - 1 : i + 2, i] = vals
    if arnoldi.is_invariant:
        H = H[:k]

    assert_arnoldi(A, v0, V, H, P, maxiter, "lanczos", M, inner, An=An)


def test_arnoldi_res_diagnostic():
    A = get_matrix_spd()
    v = np.ones(10)
    arnoldi = krylov.ArnoldiMGS(A, v)
    hs = []
    for _ in range(5):
        _, h = next(arnoldi)
        hs.append(np.asarray(h))
    H = np.zeros((6, 5))
    for k, val in enumerate(hs):
        H[: k + 2, k] = val.real
    V = np.column_stack([np.asarray(x) for x in arnoldi.V])
    from krylov_tpu.arnoldi import arnoldi_res

    res = float(np.linalg.norm(np.asarray(arnoldi_res(A, V, H))))
    assert res <= 1e-13
