"""Shared assertions + small matrix zoo for tests.

Mirrors the reference test strategy's consistency invariants
(reference: tests/helpers.py:4-23): explicit residual below tolerance, the
returned solution aliases ``info.xk``, floating resnorms of shape
``(numsteps + 1, *b.shape[1:])`` whose final entry equals the explicit
residual norm.
"""

import numpy as np


def assert_consistent(A, b, info, sol, tol):
    b = np.asarray(b)
    A_dense = np.asarray(A.todense() if hasattr(A, "todense") else A)
    xk = np.asarray(info.xk)
    res = b - A_dense @ xk
    resnorm = np.sqrt(np.einsum("i...,i...->...", res, res.conj())).real
    bnorm = np.sqrt(np.einsum("i...,i...->...", b, b.conj())).real

    if info.success:
        assert sol is not None
        assert sol.shape == b.shape
        assert np.all(resnorm < tol * (1.0 + bnorm))
        assert sol is info.xk  # the solution aliases info.xk

    resnorms = np.asarray(info.resnorms)
    assert np.issubdtype(resnorms.dtype, np.floating)
    assert np.all(np.abs(resnorm - resnorms[-1]) <= 1.0e-12 * (1 + resnorm))
    assert resnorms.shape == (info.numsteps + 1, *b.shape[1:])


def get_matrix_spd(n=10):
    a = np.linspace(1.0, 2.0, n)
    a[-1] = 1e-2
    return np.diag(a)


def get_matrix_hpd(n=10):
    a = np.array(np.linspace(1.0, 2.0, n), dtype=complex)
    a[0] = 5.0
    a[-1] = 1e-1
    A = np.diag(a)
    A[-1, 0] = 1e-1j
    A[0, -1] = -1e-1j
    return A


def get_matrix_symm_indef(n=10):
    a = np.linspace(1.0, 2.0, n)
    a[-1] = -1.0
    return np.diag(a)


def get_matrix_herm_indef(n=10):
    a = np.array(np.linspace(1.0, 2.0, n), dtype=complex)
    a[-1] = 1e-3
    A = np.diag(a)
    A[-1, 0] = 10.0j
    A[0, -1] = -10.0j
    return A


def get_matrix_nonsymm(n=10):
    a = np.arange(1, n + 1, dtype=float)
    a[-1] = -1e1
    A = np.diag(a)
    A[0, -1] = 1e1
    return A


def get_matrix_comp_nonsymm(n=10):
    a = np.arange(1, n + 1).astype(complex)
    a[-1] = -1e1
    A = np.diag(a)
    A[0, -1] = 1e1j
    return A


def get_matrices(
    spd=True,
    hpd=True,
    symm_indef=True,
    herm_indef=True,
    nonsymm=True,
    comp_nonsymm=True,
):
    matrices = []
    if spd:
        matrices.append(get_matrix_spd())
    if hpd:
        matrices.append(get_matrix_hpd())
    if symm_indef:
        matrices.append(get_matrix_symm_indef())
    if herm_indef:
        matrices.append(get_matrix_herm_indef())
    if nonsymm:
        matrices.append(get_matrix_nonsymm())
    if comp_nonsymm:
        matrices.append(get_matrix_comp_nonsymm())
    return matrices


def get_inners(n=10):
    B = np.diag(np.linspace(1.0, 5.0, n))
    return [
        lambda x, y: np.dot(x.T.conj(), y),
        lambda x, y: np.dot(x.T.conj(), np.dot(B, y)),
    ]
