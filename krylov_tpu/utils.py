"""Analysis utilities (L4).

Capability parity with the reference's utils module (reference:
src/krylov/utils.py): custom-inner QR, principal angles between subspaces,
the Hegedüs initial-guess rescaling, the Strakoš test matrix, spectral gaps,
and the overflow-safe normalized-roots polynomial.

QR/angles run on-device (``jnp.linalg.qr`` / ``jnp.linalg.svd`` instead of
LAPACK FFI crossings); the polynomial root utilities remain host-side numpy —
they are analysis-only and never sit on a hot path (SURVEY.md §2.2).
"""

import jax.numpy as jnp
import numpy as np

from .errors import ArgumentError

__all__ = [
    "qr",
    "angles",
    "hegedus",
    "strakos",
    "gap",
    "NormalizedRootsPolynomial",
    "estimate_spectrum",
]


def qr(X, inner=None, reorthos: int = 1):
    """QR factorization with a customizable inner product.

    With the default inner product this defers to the on-device
    ``jnp.linalg.qr``; with a custom inner it runs (re-orthogonalized)
    modified Gram–Schmidt (reference: src/krylov/utils.py:11-39).

    :param X: array with ``shape == (N, k)``.
    :param reorthos: number of reorthogonalizations (default 1, i.e. two MGS
        sweeps).
    :return: ``(Q, R)`` with ``<Q, Q> = I_k`` and R upper triangular.
    """
    X = jnp.asarray(X)
    if inner is None and X.shape[1] > 0:
        return jnp.linalg.qr(X, mode="reduced")

    N, k = X.shape
    Q = X
    R = jnp.zeros((k, k), dtype=X.dtype)
    for i in range(k):
        for _ in range(reorthos + 1):
            for j in range(i):
                alpha = inner(Q[:, [j]], Q[:, [i]])
                alpha = jnp.asarray(alpha).reshape(())
                R = R.at[j, i].add(alpha)
                Q = Q.at[:, [i]].add(-alpha * Q[:, [j]])
        nrm2 = jnp.asarray(inner(Q[:, [i]], Q[:, [i]])).reshape(())
        # <q, q> is real non-negative up to roundoff; |.| guards the sqrt
        rii = jnp.sqrt(jnp.abs(nrm2)).astype(X.dtype)
        R = R.at[i, i].set(rii)
        Q = Q.at[:, [i]].set(
            jnp.where(rii >= 1e-15, Q[:, [i]] / jnp.where(rii >= 1e-15, rii, 1.0), Q[:, [i]])
        )
    return Q, R


def angles(F, G, inner=None, compute_vectors: bool = False):
    """Principal angles between subspaces.

    Knyazev & Argentati alg. 6.2 (small-angle safe, optional principal
    vectors), with the same return contract as the reference
    (reference: src/krylov/utils.py:42-141).
    """
    F = jnp.asarray(F)
    G = jnp.asarray(G)

    if inner is None:
        def inner(x, y):
            return jnp.conj(x).T @ y

    # make sure that F.shape[1] >= G.shape[1]
    reverse = False
    if F.shape[1] < G.shape[1]:
        reverse = True
        F, G = G, F

    QF, _ = qr(F, inner=None if inner is None else inner)
    QG, _ = qr(G, inner=None if inner is None else inner)

    if G.shape[1] == 0:
        theta = jnp.ones(F.shape[1]) * jnp.pi / 2
        U, V = QF, QG
    else:
        Y, s, Z = jnp.linalg.svd(inner(QF, QG))
        Vcos = jnp.dot(QG, jnp.conj(Z.T))
        n_large = int(np.flatnonzero(np.asarray(s) ** 2 < 0.5).shape[0])
        n_small = s.shape[0] - n_large
        theta = jnp.hstack(
            [
                jnp.arccos(jnp.clip(s[n_small:], -1.0, 1.0)),
                jnp.ones(F.shape[1] - G.shape[1]) * jnp.pi / 2,
            ]
        )
        U = V = None
        if compute_vectors:
            Ucos = jnp.dot(QF, Y)
            U = Ucos[:, n_small:]
            V = Vcos[:, n_small:]

        if n_small > 0:
            RG = Vcos[:, :n_small]
            S = RG - jnp.dot(QF, inner(QF, RG))
            _, R = qr(S, inner=None if inner is None else inner)
            Y2, u, Z2 = jnp.linalg.svd(R)
            theta = jnp.hstack(
                [jnp.arcsin(jnp.clip(u[::-1][:n_small], -1.0, 1.0)), theta]
            )
            if compute_vectors:
                RF = Ucos[:, :n_small]
                Vsin = jnp.dot(RG, jnp.conj(Z2.T))
                Usin = jnp.dot(
                    RF,
                    jnp.dot(
                        jnp.diag(1.0 / s[:n_small]),
                        jnp.dot(jnp.conj(Z2.T), jnp.diag(s[:n_small])),
                    ),
                )
                U = jnp.column_stack([Usin, U])
                V = jnp.column_stack([Vsin, V])

    if compute_vectors:
        if reverse:
            U, V = V, U
        return theta, U, V
    return theta


def hegedus(A, b, x0, M=None, Ml=None, inner=None):
    """Rescale the initial guess to gamma_min * x0 minimizing the initial
    residual (Hegedüs trick; reference: src/krylov/utils.py:144-180)."""
    from ._inner import get_default_inner

    b = jnp.asarray(b)
    x0 = jnp.asarray(x0)
    if inner is None:
        inner = get_default_inner(b.shape)

    Ax0 = A @ x0
    MlAx0 = Ax0 if Ml is None else Ml @ Ax0
    z = MlAx0 if M is None else M @ MlAx0
    znorm2 = inner(z, MlAx0)
    if bool(jnp.all(jnp.real(znorm2) <= 1e-15)):
        return jnp.zeros_like(b)
    Mlb = b if Ml is None else Ml @ b
    gamma = inner(z, Mlb) / znorm2
    return gamma * x0


def strakos(n, l_min=0.1, l_max=100, rho=0.9):
    """The Strakoš test matrix (reference: src/krylov/utils.py:183-192)."""
    d = [
        l_min + (i - 1) * 1.0 / (n - 1) * (l_max - l_min) * (rho ** (n - i))
        for i in range(1, n + 1)
    ]
    return jnp.diag(jnp.asarray(d))


def gap(lamda, sigma, mode: str = "individual"):
    """Spectral gap between two sets of real eigenvalue estimates.

    ``individual``: smallest pairwise distance between the two sets.
    ``interval``: distance from the interval hull of ``lamda`` to the
    nearest element of ``sigma`` outside it; ``None`` if any element of
    ``sigma`` falls strictly inside the hull.
    (capability parity: reference src/krylov/utils.py:195-251)
    """
    lamda = np.atleast_1d(np.asarray(lamda))
    sigma = np.atleast_1d(np.asarray(sigma))
    if np.iscomplexobj(lamda) and lamda.imag.any() or (
        np.iscomplexobj(sigma) and sigma.imag.any()
    ):
        raise ArgumentError("complex spectra not yet implemented")
    lamda, sigma = lamda.real, sigma.real

    if mode == "individual":
        return float(np.abs(np.subtract.outer(lamda, sigma)).min())
    if mode == "interval":
        lo, hi = lamda.min(), lamda.max()
        inside = (sigma > lo) & (sigma < hi)
        if inside.any():
            return None
        below = np.where(sigma <= lo, lo - sigma, np.inf).min()
        above = np.where(sigma >= hi, sigma - hi, np.inf).min()
        return float(min(below, above))
    raise ArgumentError(f"unknown mode {mode!r}")


class NormalizedRootsPolynomial:
    r"""Polynomial with prescribed roots and p(0) = 1:

    .. math:: p(\lambda) = \prod_i (1 - \lambda / \theta_i)

    A naive left-to-right product over thousands of factors can overflow or
    underflow long before the (moderate) final value; evaluation therefore
    pairs each large-magnitude factor with a small one before multiplying.
    This is done fully vectorized: factors are sorted by magnitude along
    the root axis and re-rows with one fixed interleaving permutation, so a
    whole batch of points evaluates with no per-point Python loop.
    (capability parity: reference src/krylov/utils.py:254-316)
    """

    def __init__(self, roots):
        roots = np.asarray(roots)
        if roots.ndim != 1:
            raise ArgumentError("one-dimensional array of roots expected.")
        self.roots = roots
        # fixed interleaving: positions 0,2,4,.. take the smallest factors
        # in ascending order, 1,3,5,.. the largest in descending order
        n = roots.shape[0]
        half = (n + 1) // 2
        self._interleave = np.empty(n, dtype=int)
        self._interleave[0::2] = np.arange(half)
        self._interleave[1::2] = np.arange(n - 1, half - 1, -1)

    def minmax_candidates(self):
        """Points where the derivative vanishes (for extrema over intervals)."""
        from numpy.polynomial import Polynomial as P

        return P.fromroots(self.roots).deriv(1).roots()

    def __call__(self, points):
        pts = np.asarray(points)
        if pts.ndim > 1:
            raise ArgumentError(
                "scalar or one-dimensional array of points expected."
            )
        factors = 1.0 - np.atleast_1d(pts)[None, :] / self.roots[:, None]
        order = np.argsort(np.abs(factors), axis=0)[self._interleave]
        out = np.prod(np.take_along_axis(factors, order, axis=0), axis=0)
        return out.item() if pts.ndim == 0 else out


def estimate_spectrum(A, n=None, iters=30, safety=1.05, seed=0, M=None):
    """Estimate the extreme eigenvalues of a Hermitian operator.

    Runs ``iters`` steps of the Lanczos process (the same recurrence the
    solvers use) and returns ``(lmin / safety, lmax * safety)`` from the
    Ritz values of the tridiagonal section — widened bounds suitable as
    ``chebyshev(..., eigenvalue_estimates=...)``.  A convenience with no
    reference counterpart (the reference requires the caller to supply
    estimates, reference: src/krylov/chebyshev.py:15).

    ``n`` (matrix dimension) is needed only when ``A`` does not expose
    ``shape``.
    """
    import numpy as np

    from .arnoldi import ArnoldiLanczos

    dim = A.shape[0] if hasattr(A, "shape") else n
    if dim is None:
        raise ArgumentError("pass n= for operators without .shape")
    rng = np.random.default_rng(seed)
    v0 = jnp.asarray(rng.standard_normal(dim))
    it = ArnoldiLanczos(A, v0, M=M)
    alphas, betas = [], []
    for _ in range(min(iters, dim)):
        if it.is_invariant:
            break
        _, h, _ = next(it)
        alphas.append(float(np.real(np.asarray(h[1]))))
        betas.append(float(np.real(np.asarray(h[2]))))
    k = len(alphas)
    T = np.diag(alphas)
    for i in range(k - 1):
        T[i, i + 1] = T[i + 1, i] = betas[i]
    ritz = np.linalg.eigvalsh(T)
    lmin, lmax = float(ritz[0]), float(ritz[-1])
    # Lanczos converges to extreme eigenvalues from the inside: widen
    lo = lmin / safety if lmin > 0 else lmin * safety
    return lo, lmax * safety
