import numpy as np
import pytest
import scipy.linalg
from numpy.testing import assert_almost_equal, assert_array_equal, assert_equal

import krylov_tpu as krylov

from .helpers import get_inners, get_matrices


@pytest.mark.parametrize("X", [np.eye(10, 5), scipy.linalg.hilbert(10)[:, :5]])
@pytest.mark.parametrize("inner_idx", [0, 1])
@pytest.mark.parametrize("reorthos", [0, 1, 2])
def test_qr(X, inner_idx, reorthos):
    inner = get_inners()[inner_idx]
    N, k = X.shape
    s = scipy.linalg.svd(X, compute_uv=False)
    Q, R = krylov.utils.qr(X, inner=inner, reorthos=reorthos)
    Q, R = np.asarray(Q), np.asarray(R)

    assert Q.shape == (N, k)
    assert R.shape == (k, k)
    assert np.linalg.norm(np.dot(Q, R) - X, 2) <= 1e-14 * max(s)
    orthotol = 1e-8 if reorthos < 1 else 1e-14
    assert np.linalg.norm(inner(Q, Q) - np.eye(k), 2) <= orthotol
    assert np.linalg.norm(np.tril(R, -1)) == 0


def test_qr_default_inner():
    X = scipy.linalg.hilbert(10)[:, :5]
    Q, R = krylov.utils.qr(X)
    assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - X, 2) <= 1e-13


_FGs = [
    np.eye(10, 1),
    1j * np.eye(10, 1),
    np.eye(10, 4),
    np.eye(10)[:, -4:],
    np.dot(np.eye(10, 4), np.diag([1, 1e1, 1e2, 1e3])),
]


@pytest.mark.parametrize("Fi", range(len(_FGs)))
@pytest.mark.parametrize("Gi", range(len(_FGs)))
@pytest.mark.parametrize("inner_idx", [0, 1])
@pytest.mark.parametrize("compute_vectors", [False, True])
def test_angles(Fi, Gi, inner_idx, compute_vectors):
    F, G = _FGs[Fi], _FGs[Gi]
    inner = get_inners()[inner_idx]
    out = krylov.utils.angles(F, G, inner=inner, compute_vectors=compute_vectors)
    theta = np.asarray(out[0] if compute_vectors else out)

    assert theta.shape == (max(F.shape[1], G.shape[1]),)
    assert ((theta - np.sort(theta)) == 0).all()
    assert (theta >= 0).all()
    assert (theta <= np.pi / 2 + 1e-15).all()
    n = abs(F.shape[1] - G.shape[1])
    if n > 0:
        assert (np.abs(theta[-n:] - np.pi / 2) <= 1e-15).all()
    if Fi == Gi:
        assert np.linalg.norm(theta) <= 1e-7

    if compute_vectors:
        U, V = np.asarray(out[1]), np.asarray(out[2])
        assert U.shape == F.shape
        assert V.shape == G.shape
        UV = inner(U, V)
        assert (
            np.linalg.norm(UV - np.diag(np.cos(theta))[: F.shape[1], : G.shape[1]])
            <= 1e-13
        )


def _get_m():
    m = np.array(range(1, 11), dtype=float)
    m[-1] = 1.0
    return m


@pytest.mark.parametrize("A", get_matrices())
@pytest.mark.parametrize(
    "x0",
    [np.zeros((10, 1)), np.linspace(1, 5, 10).reshape((10, 1)), np.ones((10, 1))],
)
@pytest.mark.parametrize("M", [None, np.diag(_get_m())])
@pytest.mark.parametrize("Ml", [None, np.diag(_get_m())])
@pytest.mark.parametrize("inner_idx", [0, 1])
def test_hegedus(A, x0, M, Ml, inner_idx):
    inner = get_inners()[inner_idx]
    x = np.ones((10, 1))
    b = A @ x

    x0new = np.asarray(krylov.utils.hegedus(A, b, x0, M, Ml, inner))

    def mml_norm(z):
        r = b - A @ z
        Mlr = r if Ml is None else Ml @ r
        MMlr = Mlr if M is None else M @ Mlr
        return np.sqrt(np.abs(inner(Mlr, MMlr)))

    assert mml_norm(x0new) <= mml_norm(x0) + 1e-13


def test_strakos():
    S = np.asarray(krylov.utils.strakos(5))
    assert S.shape == (5, 5)
    assert abs(S[0, 0] - 0.1) < 1e-14


def test_gap():
    assert_almost_equal(krylov.utils.gap([1, 2], [-4, 3]), 1)
    assert_almost_equal(krylov.utils.gap(5, -5), 10)
    assert_almost_equal(krylov.utils.gap([-5, 5], -5), 0)
    assert_almost_equal(krylov.utils.gap(5, -5, mode="interval"), 10)
    assert_almost_equal(krylov.utils.gap(5, [-5, 6], mode="interval"), 1)
    assert_almost_equal(krylov.utils.gap(-5, [-5, 6], mode="interval"), 0)
    assert krylov.utils.gap([-5, 5], [0], mode="interval") is None


@pytest.mark.parametrize(
    "roots", [[1, 2], [1, 1j], [1, 2, 1e8], [1, 2, 1e8, 1e8 + 1e-3]]
)
def test_normalized_roots_polynomial(roots):
    p = krylov.utils.NormalizedRootsPolynomial(roots)

    assert_array_equal(p(roots), np.zeros((len(roots),)))
    assert_equal(p(0), 1)

    if np.isrealobj(roots):
        interval = np.linspace(roots[0], roots[1], 100)
        candidates = p.minmax_candidates()
        c = [roots[0], roots[1]]
        for candidate in candidates:
            if roots[0] <= candidate <= roots[1]:
                c.append(candidate)
        assert_almost_equal(
            np.max(np.abs(p(interval))), np.max(np.abs(p(c))), decimal=4
        )


def test_estimate_spectrum_bounds_chebyshev():
    """Lanczos-based spectrum estimation (extension: the reference makes
    the caller supply chebyshev's eigenvalue_estimates)."""
    import krylov_tpu
    from krylov_tpu.ops import stencil

    A = stencil.poisson_2d(16, 16)  # spectrum inside (0, 8)
    lo, hi = krylov_tpu.utils.estimate_spectrum(A, iters=40)
    assert 0 < lo < hi <= 8.5

    rng = np.random.default_rng(3)
    import jax.numpy as jnp

    b = jnp.asarray(rng.standard_normal(256))
    sol, info = krylov_tpu.chebyshev(
        A, b, eigenvalue_estimates=(lo, hi), tol=1e-6, maxiter=3000
    )
    assert info.success
