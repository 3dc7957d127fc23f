import numpy as np
import pytest

import krylov_tpu as krylov

_factors = [0.0, 1.0, 1.0j, 1.0 + 1.0j, 1e8, 1.0e-8]


@pytest.mark.parametrize("a", _factors)
@pytest.mark.parametrize("length", [10, 1])
def test_householder(a, length):
    rng = np.random.default_rng(0)
    x = rng.normal(size=length) + 1j * rng.normal(size=length)
    x = a * x
    H = krylov.Householder(x)

    y = np.asarray(H @ x)
    # Hx = alpha * ||x|| e_1
    xnorm = np.linalg.norm(x, 2)
    assert abs(abs(y[0]) - xnorm) <= 1e-14 * (1 + xnorm)
    assert np.linalg.norm(y[1:], 2) <= 1e-14 * (1 + xnorm)

    # involution: H(Hx) == x
    z = np.asarray(H @ (H @ x))
    assert np.linalg.norm(z - x, 2) <= 1e-14 * (1 + xnorm)

    # matrix representation is unitary and matches @
    M = np.asarray(H.matrix())
    assert np.allclose(M @ M.T.conj(), np.eye(length), atol=1e-14)
    assert np.allclose(M @ x, y, atol=1e-14 * (1 + xnorm))


def test_householder_real():
    x = np.array([3.0, 4.0])
    H = krylov.Householder(x)
    y = np.asarray(H @ x)
    assert abs(abs(y[0]) - 5.0) < 1e-14
    assert abs(y[1]) < 1e-14


def test_householder_e1():
    # x a multiple of e1 -> H is the identity (beta = 0)
    x = np.array([2.0, 0.0, 0.0])
    H = krylov.Householder(x)
    assert float(H.beta) == 0.0
    y = np.asarray(H @ np.array([1.0, 2.0, 3.0]))
    assert np.allclose(y, [1.0, 2.0, 3.0])


def test_householder_quasi_2d():
    x = np.array([[3.0], [4.0]])
    H = krylov.Householder(x)
    y = np.asarray(H @ x)
    assert y.shape == (2, 1)
    assert abs(abs(y[0, 0]) - 5.0) < 1e-14
