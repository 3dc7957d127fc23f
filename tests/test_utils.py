"""Analysis-utility tests (L4), written against the contracts.

Covers the same capability surface as the reference's utils tests
(reference: tests/test_utils.py) but is structured around properties:

* ``qr``: factorization identity, inner-product orthonormality,
  triangularity, and the reorthogonalization accuracy ladder, on random
  and Hilbert (ill-conditioned) inputs;
* ``angles``: analytically constructed subspace pairs with KNOWN angles
  (rotations in coordinate planes), symmetry/invariance properties, the
  principal-vector pairing contract <U, V> = diag(cos theta), and a
  small-angle accuracy case the cosine-only formula cannot pass;
* ``hegedus``: the rescaled guess must minimize the preconditioned
  residual over the whole gamma line, not merely improve it.
"""

import numpy as np
import pytest
import scipy.linalg

import krylov_tpu as krylov

from .helpers import get_inners


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# qr
# ---------------------------------------------------------------------------


def _qr_inputs():
    # n = 10 throughout: the helpers' weighted inner carries a fixed
    # 10-point weight vector
    rng = _rng(1)
    well = rng.standard_normal((10, 5))
    hilbert = scipy.linalg.hilbert(10)[:, :5]  # severely ill-conditioned
    complex_ = rng.standard_normal((10, 4)) + 1j * rng.standard_normal((10, 4))
    return {"well": well, "hilbert": hilbert, "complex": complex_}


@pytest.mark.parametrize("case", ["well", "hilbert", "complex"])
@pytest.mark.parametrize("inner_idx", [0, 1])
@pytest.mark.parametrize("reorthos", [0, 1, 2])
def test_qr_contract(case, inner_idx, reorthos):
    X = _qr_inputs()[case]
    inner = get_inners()[inner_idx]
    n, k = X.shape

    Q, R = krylov.utils.qr(X, inner=inner, reorthos=reorthos)
    Q, R = np.asarray(Q), np.asarray(R)

    assert Q.shape == (n, k) and R.shape == (k, k)
    # R strictly upper triangular below the diagonal
    assert np.linalg.norm(np.tril(R, -1)) == 0
    # factorization identity at machine precision relative to scale
    smax = scipy.linalg.svd(X, compute_uv=False).max()
    assert np.linalg.norm(Q @ R - X, 2) <= 1e-13 * smax
    # orthonormality ladder: one refinement pass reaches machine precision
    # even on the Hilbert columns; zero passes only gets O(eps*cond)
    loss = np.linalg.norm(inner(Q, Q) - np.eye(k), 2)
    assert loss <= (1e-8 if reorthos == 0 else 1e-14)


def test_qr_default_inner_and_empty():
    X = _qr_inputs()["hilbert"]
    Q, R = krylov.utils.qr(X)
    assert np.linalg.norm(np.asarray(Q) @ np.asarray(R) - X, 2) <= 1e-13
    Q0, R0 = krylov.utils.qr(np.zeros((7, 0)))
    assert np.asarray(Q0).shape == (7, 0) and np.asarray(R0).shape == (0, 0)


# ---------------------------------------------------------------------------
# angles
# ---------------------------------------------------------------------------


def _plane_pair(thetas, n=12, seed=3):
    """Subspace pair with PRESCRIBED principal angles.

    F spans e_0..e_{k-1}; G spans rotations of e_i by thetas[i] into the
    disjoint directions e_{k+i} — by construction the principal angles of
    (F, G) are exactly ``thetas``.  Both factors are then mixed by random
    invertible column operations, which must not change the angles.
    """
    k = len(thetas)
    rng = _rng(seed)
    F = np.eye(n, k)
    G = np.zeros((n, k))
    for i, t in enumerate(thetas):
        G[i, i] = np.cos(t)
        G[k + i, i] = np.sin(t)
    mixF = rng.standard_normal((k, k)) + 3 * np.eye(k)
    mixG = rng.standard_normal((k, k)) + 3 * np.eye(k)
    return F @ mixF, G @ mixG


@pytest.mark.parametrize(
    "thetas",
    [
        [0.3, 0.7, 1.2],
        [0.0, 0.5],                      # exact zero angle
        [1e-8, 1e-6, 0.2],               # small angles: sine-pass territory
        [np.pi / 2 - 1e-3, np.pi / 2],   # near/at orthogonal
    ],
)
def test_angles_prescribed(thetas):
    F, G = _plane_pair(thetas)
    got = np.sort(np.asarray(krylov.utils.angles(F, G)))
    want = np.sort(np.asarray(thetas, float))
    # absolute accuracy for the large ones, relative for the tiny ones
    assert np.all(np.abs(got - want) <= 1e-10 + 1e-7 * want)


def test_angles_small_angle_relative_accuracy():
    """theta = 1e-8: cos(theta) rounds to 1.0 in f64, so a cosine-only
    SVD would return 0; the sine pass must recover the angle to RELATIVE
    accuracy.  This property test does not exist in the reference suite
    and pins the entire reason for alg. 6.2's two-sided split."""
    t = 1e-8
    F, G = _plane_pair([t])
    got = float(np.asarray(krylov.utils.angles(F, G))[0])
    assert abs(got - t) <= 1e-4 * t


def test_angles_shape_symmetry_and_padding():
    rng = _rng(5)
    F = rng.standard_normal((10, 5))
    G = rng.standard_normal((10, 2))
    th = np.asarray(krylov.utils.angles(F, G))
    # length max(dims), ascending, in [0, pi/2], padded with pi/2
    assert th.shape == (5,)
    assert np.all(np.diff(th) >= -1e-15)
    assert np.all((th >= 0) & (th <= np.pi / 2 + 1e-15))
    assert np.all(np.abs(th[-3:] - np.pi / 2) <= 1e-15)
    # symmetric in its arguments
    th_swap = np.asarray(krylov.utils.angles(G, F))
    np.testing.assert_allclose(th, th_swap, atol=1e-13)
    # self-angles vanish
    assert np.linalg.norm(np.asarray(krylov.utils.angles(F, F))) <= 1e-7


@pytest.mark.parametrize("inner_idx", [0, 1])
@pytest.mark.parametrize(
    "dims", [(1, 1), (4, 4), (4, 2), (2, 4), (4, 4j)]
)
def test_angles_vectors_pairing(inner_idx, dims):
    """compute_vectors contract: U spans F's side, V spans G's side, and
    <U, V> = diag(cos(theta)) as a (dimF x dimG) rectangle."""
    rng = _rng(7)
    kf, kg = dims
    complex_ = isinstance(kg, complex)
    if complex_:
        kg = int(kg.imag)
    n = 10

    def draw(k):
        X = rng.standard_normal((n, k))
        if complex_:
            X = X + 1j * rng.standard_normal((n, k))
        return X

    F, G = draw(kf), draw(kg)
    inner = get_inners()[inner_idx]
    if complex_ and inner_idx == 1:
        pytest.skip("helpers' weighted inner is real-valued")
    th, U, V = krylov.utils.angles(F, G, inner=inner, compute_vectors=True)
    th, U, V = np.asarray(th), np.asarray(U), np.asarray(V)
    # the vector-free path (no U/V products) must return identical angles
    np.testing.assert_allclose(
        np.asarray(krylov.utils.angles(F, G, inner=inner)), th, atol=1e-13
    )
    assert U.shape == F.shape and V.shape == G.shape
    want = np.zeros((kf, kg))
    m = min(kf, kg)
    want[:m, :m] = np.diag(np.cos(th))[:m, :m]
    assert np.linalg.norm(inner(U, V) - want) <= 1e-12
    # each side is orthonormal in the inner product
    assert np.linalg.norm(inner(U, U) - np.eye(kf)) <= 1e-12
    assert np.linalg.norm(inner(V, V) - np.eye(kg)) <= 1e-12


# ---------------------------------------------------------------------------
# hegedus
# ---------------------------------------------------------------------------


def _hegedus_norm(A, b, z, M, Ml, inner):
    r = b - A @ z
    Mlr = r if Ml is None else Ml @ r
    MMlr = Mlr if M is None else M @ Mlr
    return float(np.sqrt(np.abs(inner(Mlr, MMlr))).reshape(()))


@pytest.mark.parametrize("prec", ["none", "M", "Ml", "both"])
@pytest.mark.parametrize("inner_idx", [0, 1])
@pytest.mark.parametrize("x0_kind", ["zero", "scaled_sol", "random"])
def test_hegedus_minimizes_over_gamma_line(prec, inner_idx, x0_kind):
    rng = _rng(11)
    n = 10
    A = np.diag(np.arange(2.0, 2.0 + n)) + 0.3 * rng.standard_normal((n, n))
    x_true = np.ones((n, 1))
    b = A @ x_true
    x0 = {
        "zero": np.zeros((n, 1)),
        "scaled_sol": 7.3 * x_true,
        "random": rng.standard_normal((n, 1)),
    }[x0_kind]
    d = np.diag(1.0 + rng.random(n))
    M = d if prec in ("M", "both") else None
    Ml = d if prec in ("Ml", "both") else None
    inner = get_inners()[inner_idx]

    x0_new = np.asarray(krylov.utils.hegedus(A, b, x0, M, Ml, inner))
    got = _hegedus_norm(A, b, x0_new, M, Ml, inner)

    # the returned point must (weakly) beat EVERY gamma on the line,
    # including gamma=1 (the original guess) and gamma=0
    for gamma in np.linspace(-2.0, 2.0, 41):
        assert got <= _hegedus_norm(A, b, gamma * x0, M, Ml, inner) + 1e-12


def test_hegedus_zero_direction_returns_zero_guess():
    A = np.eye(4)
    b = np.ones(4)
    out = np.asarray(krylov.utils.hegedus(A, b, np.zeros(4)))
    np.testing.assert_array_equal(out, np.zeros(4))


# ---------------------------------------------------------------------------
# strakos / gap / NormalizedRootsPolynomial
# ---------------------------------------------------------------------------


def test_strakos_matrix():
    S = np.asarray(krylov.utils.strakos(5))
    assert S.shape == (5, 5)
    d = np.diag(S)
    assert abs(d[0] - 0.1) < 1e-14  # l_min at the first entry
    assert np.all(np.diff(d) > 0)   # strictly increasing spectrum
    assert abs(d[-1] - 100.0) < 1e-12


def test_gap_modes():
    # individual: min pairwise distance
    assert abs(krylov.utils.gap([1, 2], [-4, 3]) - 1) < 1e-14
    assert abs(krylov.utils.gap(5, -5) - 10) < 1e-14
    assert abs(krylov.utils.gap([-5, 5], -5) - 0) < 1e-14
    # interval: distance from the hull of lamda to sigma outside it
    assert abs(krylov.utils.gap(5, -5, mode="interval") - 10) < 1e-14
    assert abs(krylov.utils.gap(5, [-5, 6], mode="interval") - 1) < 1e-14
    assert abs(krylov.utils.gap(-5, [-5, 6], mode="interval") - 0) < 1e-14
    # sigma strictly inside the hull -> undefined
    assert krylov.utils.gap([-5, 5], [0], mode="interval") is None


@pytest.mark.parametrize(
    "roots", [[1, 2], [1, 1j], [1, 2, 1e8], [1, 2, 1e8, 1e8 + 1e-3]]
)
def test_normalized_roots_polynomial(roots):
    p = krylov.utils.NormalizedRootsPolynomial(roots)
    # p vanishes at its roots and is 1 at the origin
    np.testing.assert_array_equal(p(np.asarray(roots)), np.zeros(len(roots)))
    assert p(0) == 1

    if np.isrealobj(roots):
        # the max over an interval is attained at endpoints or interior
        # stationary points
        interval = np.linspace(roots[0], roots[1], 100)
        cand = [roots[0], roots[1]] + [
            c for c in p.minmax_candidates() if roots[0] <= c <= roots[1]
        ]
        np.testing.assert_almost_equal(
            np.max(np.abs(p(interval))), np.max(np.abs(p(np.asarray(cand)))),
            decimal=4,
        )


def test_normalized_roots_polynomial_overflow_safety():
    """Thousands of roots with factors spanning ~1e2 in magnitude: a
    magnitude-DESCENDING product overflows f64 within ~160 factors while
    the true value is far below the overflow threshold; the interleaved
    small/large pairing must keep every partial product representable."""
    roots = np.linspace(0.01, 2.0, 5000)
    p = krylov.utils.NormalizedRootsPolynomial(roots)
    x = 1.0
    factors = 1.0 - x / roots
    # naive descending-order partial products overflow
    desc = np.sort(np.abs(factors))[::-1]
    assert np.cumprod(desc[:300]).max() == np.inf
    val = p(np.asarray([x]))[0]
    assert np.isfinite(val)
    # log-domain ground truth (value deep in underflow -> 0.0 is exact)
    logsum = np.sum(np.log(np.abs(factors)))
    if logsum < -745:
        assert val == 0.0
    else:
        np.testing.assert_allclose(
            np.log(abs(val)), logsum, rtol=1e-10
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
