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

    With the default (Euclidean) inner product this defers to the on-device
    ``jnp.linalg.qr``.  With a custom inner it runs left-looking modified
    Gram–Schmidt with ``reorthos`` refinement passes per column: each pass
    re-projects the column against every finished basis vector and folds the
    measured coefficients back into R, so R stays the exact factor of the
    *performed* transformation regardless of how many passes run.
    (Capability parity: reference src/krylov/utils.py:11-39.)

    :param X: array with ``shape == (N, k)``.
    :param reorthos: extra orthogonalization passes per column (default 1,
        i.e. MGS2 — enough for orthogonality at machine precision on
        ill-conditioned inputs).
    :return: ``(Q, R)`` with ``<Q, Q> = I_k`` and R upper triangular.
    """
    X = jnp.asarray(X)
    n, k = X.shape
    if k == 0:
        return X, jnp.zeros((0, 0), dtype=X.dtype)
    if inner is None:
        return jnp.linalg.qr(X, mode="reduced")

    basis = []   # finished orthonormal columns, each (n, 1)
    r_cols = []  # matching columns of R, each (k,)
    for i in range(k):
        v = X[:, i : i + 1]
        coeff = jnp.zeros((k,), dtype=X.dtype)
        for _ in range(reorthos + 1):
            for j, qj in enumerate(basis):
                c = jnp.asarray(inner(qj, v)).reshape(())
                v = v - c * qj
                coeff = coeff.at[j].add(c)
        nrm2 = jnp.asarray(inner(v, v)).reshape(())
        # <v, v> is real non-negative up to roundoff; |.| guards the sqrt
        nrm = jnp.sqrt(jnp.abs(nrm2)).astype(X.dtype)
        # a (numerically) zero column stays unnormalized: R records 0 and
        # downstream consumers see an exactly reproducible X = Q R
        safe = jnp.where(jnp.abs(nrm) >= 1e-15, nrm, 1.0)
        basis.append(jnp.where(jnp.abs(nrm) >= 1e-15, v / safe, v))
        r_cols.append(coeff.at[i].set(nrm))
    return jnp.concatenate(basis, axis=1), jnp.stack(r_cols, axis=1)


def angles(F, G, inner=None, compute_vectors: bool = False):
    """Principal angles between ``range(F)`` and ``range(G)``.

    Implements the sine/cosine split of Knyazev & Argentati, *Principal
    angles between subspaces in an A-based scalar product* (SIAM J. Sci.
    Comput. 23(6), 2002), alg. 6.2, for any (possibly weighted) inner
    product.  Return contract matches the reference
    (reference: src/krylov/utils.py:42-141): ``theta`` ascending of length
    ``max(dim F, dim G)``, padded with ``pi/2``; with
    ``compute_vectors=True`` also principal vectors ``U, V`` satisfying
    ``<U, V> = diag(cos(theta))``.

    Method: after orthonormalizing both bases, the SVD
    ``<QF, QG> = Y diag(sigma) Z^H`` yields cosines — accurate only for
    angles above pi/4.  For the ``ns`` angles below pi/4 (``sigma^2 >=
    1/2``) the sines are recomputed from the component of the G-side
    principal vectors orthogonal to ``range(F)``; in exact arithmetic
    ``<B, B> = I - diag(sigma^2)``, so the SVD of its triangular factor
    returns ``sin(theta)`` to full *relative* accuracy where
    ``1 - sigma^2`` would lose every digit.
    """
    F = jnp.asarray(F)
    G = jnp.asarray(G)

    # orient so F spans the larger space; undo on the vectors at the end
    swapped = F.shape[1] < G.shape[1]
    if swapped:
        F, G = G, F
    p, q = F.shape[1], G.shape[1]

    if inner is None:
        def ip(x, y):
            return jnp.conj(x).T @ y
    else:
        ip = inner

    QF, _ = qr(F, inner=inner)
    QG, _ = qr(G, inner=inner)

    if q == 0:
        theta = jnp.full((p,), jnp.pi / 2)
        U, V = QF, QG
    else:
        # cosine pass: sigma descending, so the small angles come first
        Y, sigma, Zh = jnp.linalg.svd(ip(QF, QG))
        Z = jnp.conj(Zh).T
        ns = int(np.count_nonzero(np.asarray(sigma) ** 2 >= 0.5))
        # the dense principal-vector products are O(n p^2): only the
        # ns small-angle G-side columns are needed for the sine pass;
        # the full U/V pair is built on request alone
        if compute_vectors:
            U = QF @ Y                  # (n, p) F-side principal vectors
            V = QG @ Z                  # (n, q) G-side principal vectors
        theta = jnp.concatenate(
            [
                jnp.arccos(jnp.clip(sigma[ns:], -1.0, 1.0)),
                jnp.full((p - q,), jnp.pi / 2),
            ]
        )

        if ns > 0:
            # sine pass over the first ns pairs
            Vs = V[:, :ns] if compute_vectors else QG @ Z[:, :ns]
            B = Vs - QF @ ip(QF, Vs)    # G-side component outside range(F)
            _, Rb = qr(B, inner=inner)
            _, mu, Zbh = jnp.linalg.svd(Rb)
            mu = mu[::-1]               # ascending, pairs with theta order
            theta = jnp.concatenate(
                [jnp.arcsin(jnp.clip(mu, -1.0, 1.0)), theta]
            )
            if compute_vectors:
                # Re-pair the vectors under the sine-based rotation Zb
                # (columns reversed to match the ascending angles):
                #   V_small <- Vs Zb.
                # The F side must rotate compatibly.  For unitary Mrot with
                # <U_s Mrot, Vs Zb> diagonal, use (derived, see docs):
                #   Mrot = diag(sigma_s) Zb diag(1/cos(theta_s)),
                # which is unitary because Zb^H diag(sigma_s^2) Zb =
                # diag(cos^2 theta_s) in exact arithmetic, and maps
                # <U_s, Vs> = diag(sigma_s) onto diag(cos theta_s) with the
                # cosines evaluated from mu (cos = sqrt(1 - mu^2) keeps
                # full accuracy here since theta_s < pi/4).
                Zb = jnp.conj(Zbh).T[:, ::-1]
                cos_s = jnp.sqrt(1.0 - jnp.clip(mu, 0.0, 1.0) ** 2)
                Mrot = (sigma[:ns, None] * Zb) / cos_s[None, :]
                U = jnp.concatenate([U[:, :ns] @ Mrot, U[:, ns:]], axis=1)
                V = jnp.concatenate([Vs @ Zb, V[:, ns:]], axis=1)

    if compute_vectors:
        if swapped:
            U, V = V, U
        return theta, U, V
    return theta


def hegedus(A, b, x0, M=None, Ml=None, inner=None):
    """Rescale an initial guess to minimize the initial residual.

    The Hegedüs trick: over the one-parameter family ``gamma * x0`` the
    preconditioned residual norm
    ``|| Ml (b - gamma A x0) ||_M`` is a quadratic in ``gamma``; its
    minimizer is the Galerkin coefficient

        ``gamma = <M Ml A x0, Ml b> / <M Ml A x0, Ml A x0>``.

    Costs one matvec and removes the worst-case factor-2 overhead of a
    badly scaled ``x0`` (reference capability: src/krylov/utils.py:144-180).
    When ``A x0`` is numerically zero the scale is irrelevant and the zero
    vector (exact minimizer of the family) is returned.
    """
    from ._inner import get_default_inner

    b = jnp.asarray(b)
    x0 = jnp.asarray(x0)
    ip = get_default_inner(b.shape) if inner is None else inner

    def apply(op, v):
        return v if op is None else op @ v

    w = apply(Ml, A @ x0)
    Mw = apply(M, w)
    denom = ip(Mw, w)  # squared (M, Ml)-seminorm of A @ x0
    if not bool(jnp.any(jnp.real(denom) > 1e-15)):
        return jnp.zeros_like(x0)
    gamma = ip(Mw, apply(Ml, b)) / denom
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
