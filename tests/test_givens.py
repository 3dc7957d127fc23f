import numpy as np
import pytest

import krylov_tpu as krylov

_factors = [0.0, 1.0, 1.0j, 1.0 + 1.0j, 1e8, 1.0e-8]


@pytest.mark.parametrize("a", _factors)
@pytest.mark.parametrize("b", _factors)
def test_givens(a, b):
    x = np.array([a, b])
    G, r = krylov.givens(x)
    G = np.asarray(G)
    r = np.asarray(r)

    # rotation is unitary
    eye = G @ G.T.conj()
    assert np.allclose(eye, np.eye(2), atol=1e-14)

    # it annihilates the second component
    y = G @ x
    ref_norm = np.linalg.norm(x, 2)
    assert abs(np.linalg.norm(y, 2) - ref_norm) <= 1e-14 * (1 + ref_norm)
    assert abs(y[1]) <= 1e-14 * (1 + ref_norm)
    assert abs(y[0] - r) <= 1e-14 * (1 + ref_norm)
    # norm preservation: |r| == ||x||
    assert abs(abs(r) - ref_norm) <= 1e-8 * (1 + ref_norm)


def test_givens_lapack_edge_cases():
    # G==0 -> c=1, s=0 ; F==0, G!=0 -> c=0, s=1 (LAPACK *lartg conventions)
    c, s, r = krylov.givens.__globals__["lartg"](np.float64(3.0), np.float64(0.0))
    assert c == 1.0 and s == 0.0 and r == 3.0
    c, s, r = krylov.givens.__globals__["lartg"](np.float64(0.0), np.float64(2.0))
    assert c == 0.0 and s == 1.0 and r == 2.0
    # |F| > |G| => c > 0
    c, s, r = krylov.givens.__globals__["lartg"](np.float64(-3.0), np.float64(1.0))
    assert c > 0.0


@pytest.mark.parametrize("shape_tail", [(), (1,), (3,)])
def test_givens_batched(shape_tail):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(2,) + shape_tail)
    G, R = krylov.givens(X)
    assert G.shape == (2, 2) + shape_tail
    assert R.shape == shape_tail
    from krylov_tpu.givens import apply_givens

    Y = np.asarray(apply_givens(G, X))
    assert np.allclose(Y[1], 0.0, atol=1e-14)
    assert np.allclose(Y[0], np.asarray(R), atol=1e-14)
