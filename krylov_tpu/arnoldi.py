"""Arnoldi / Lanczos orthogonalization processes (L2).

Computes V (and P with preconditioning) and H with ``A V_n = V_{n+1} H_n``;
if the Krylov subspace becomes A-invariant the relation truncates to
``A V_n = V_n H_n``.  Capability parity with the reference iterators
(reference: src/krylov/arnoldi.py:33-301): three variants —

* :class:`ArnoldiHouseholder` — accumulated Householder reflectors,
  Euclidean inner product only,
* :class:`ArnoldiMGS` — modified Gram–Schmidt with ``num_reorthos`` passes,
  arbitrary inner product and SPD preconditioner M (maintains the dual basis
  ``V = M P``),
* :class:`ArnoldiLanczos` — three-term recurrence, O(1) state.

These iterator classes are the *eager* (host-stepped) interface used by the
parity-mode solvers and direct API users.  The compiled solvers do not call
them: they inline the same recurrences as functional steps over fixed
``(maxiter+1, N, ...)`` basis buffers inside ``lax.while_loop`` (see
solvers/gmres.py, solvers/minres.py) — growing Python lists cannot live in
traced code.

The invariant-subspace flag semantics match the reference: iterating past an
invariant subspace raises :class:`~krylov_tpu.errors.ArgumentError`.
"""

import jax.numpy as jnp
import numpy as np

from ._inner import get_default_inner
from ._operators import Identity, as_operator
from .errors import ArgumentError
from .householder import Householder

_INVARIANT_MSG = (
    "Krylov subspace was found to be invariant in the previous iteration."
)


def _common_dtype(*objs):
    return np.result_type(*(getattr(o, "dtype", o) for o in objs))


class ArnoldiHouseholder:
    """Arnoldi via accumulated Householder reflections.

    (reference: src/krylov/arnoldi.py:33-104)
    """

    def __init__(self, A, v):
        self.inner = get_default_inner(v.shape)
        self.A = A
        self.v = jnp.asarray(v)
        self.dtype = _common_dtype(A, self.v)

        self.iter = 0
        self.V = []
        self.is_invariant = False

        self.houses = [Householder(self.v)]
        self.vnorm = jnp.linalg.norm(self.v, 2)
        self.V.append(self.v / jnp.where(self.vnorm != 0.0, self.vnorm, 1.0))

    def __iter__(self):
        return self

    def __next__(self):
        if self.is_invariant:
            raise ArgumentError(_INVARIANT_MSG)

        k = self.iter
        Av = jnp.asarray(self.A @ self.V[k])

        # project through all previous reflectors
        for j in range(k + 1):
            Av = Av.at[j:].set(self.houses[j] @ Av[j:])
            Av = Av.at[j].multiply(jnp.conj(self.houses[j].alpha))

        N = self.v.shape[0]
        if k < N - 1:
            house = Householder(Av[k + 1 :])
            self.houses.append(house)
            Av = Av.at[k + 1 :].set((house @ Av[k + 1 :]) * jnp.conj(house.alpha))
            h = Av[: k + 2]
            h = h.at[-1].set(jnp.abs(h[-1]))

            if bool(np.all(np.asarray(h[-1]) <= 1.0e-14)):
                self.is_invariant = True
                v = None
            else:
                vnew = jnp.zeros_like(self.v)
                vnew = vnew.at[k + 1].set(1)
                for j in range(k + 1, -1, -1):
                    vnew = vnew.at[j:].set(self.houses[j] @ vnew[j:])
                v = vnew * self.houses[-1].alpha
                self.V.append(v)
        else:
            h = jnp.zeros([Av.shape[0] + 1] + list(self.v.shape[1:]), Av.dtype)
            h = h.at[:-1].set(Av)
            self.is_invariant = True
            v = None

        self.iter += 1
        return v, h


class ArnoldiMGS:
    """Arnoldi via (re-orthogonalized) modified Gram–Schmidt.

    With a preconditioner M, maintains the dual bases ``P`` and ``V = M P``
    (reference: src/krylov/arnoldi.py:107-200).
    """

    def __init__(
        self,
        A,
        v,
        num_reorthos: int = 1,
        M=None,
        Mv=None,
        Mv_norm=None,
        inner=None,
    ):
        self.inner = get_default_inner(v.shape) if inner is None else inner
        # per-RHS scalar shape derived from the inner product, not v.shape[1:]
        # (full-contraction inners for grid-shaped vectors give tail == ());
        # evaluated concretely: user inners may be numpy-based (untraceable)
        self.tail = tuple(jnp.shape(self.inner(v, v)))
        self.A = A
        self.v = jnp.asarray(v)
        self.num_reorthos = num_reorthos
        self.M = Identity() if M is None else as_operator(M)
        self.dtype = _common_dtype(A, self.M, self.v)

        self.iter = 0
        self.V = []
        self.P = []
        self.is_invariant = False

        p = self.v
        v_ = self.M @ p if Mv is None else Mv
        if Mv_norm is None:
            self.vnorm = jnp.sqrt(self.inner(p, v_))
        else:
            self.vnorm = Mv_norm

        safe = jnp.where(self.vnorm != 0.0, self.vnorm, 1.0)
        self.P.append(p / safe)
        self.V.append(v_ / safe)

    def _mgs_pass(self, k, Av, h):
        for j in range(k + 1):
            alpha = self.inner(self.V[j], Av)
            h = h.at[j].add(alpha)
            Av = Av - alpha * self.P[j]
        return Av, h

    def __iter__(self):
        return self

    def __next__(self):
        if self.is_invariant:
            raise ArgumentError(_INVARIANT_MSG)

        k = self.iter
        Av = jnp.asarray(self.A @ self.V[k])

        h = jnp.zeros([k + 2] + list(self.tail), dtype=self.dtype)
        for _ in range(self.num_reorthos):
            Av, h = self._mgs_pass(k, Av, h)

        MAv = self.M @ Av
        h = h.at[k + 1].set(jnp.sqrt(self.inner(Av, MAv)))

        if bool(np.all(np.asarray(h[k + 1]) <= 1.0e-14)):
            self.is_invariant = True
            v = None
        else:
            Hk1k = jnp.where(h[k + 1] != 0.0, h[k + 1], 1.0)
            self.P.append(Av / Hk1k)
            v = MAv / Hk1k
            self.V.append(v)

        self.iter += 1
        return v, h


class ArnoldiLanczos:
    """Three-term Lanczos recurrence; stores only p_old, p, v.

    (reference: src/krylov/arnoldi.py:203-281)
    """

    def __init__(self, A, v, M=None, Mv=None, Mv_norm=None, inner=None):
        self.A = A
        self.M = Identity() if M is None else as_operator(M)
        self.inner = get_default_inner(v.shape) if inner is None else inner
        # per-RHS scalar shape derived from the inner product, not v.shape[1:]
        # (full-contraction inners for grid-shaped vectors give tail == ());
        # evaluated concretely: user inners may be numpy-based (untraceable)
        self.tail = tuple(jnp.shape(self.inner(v, v)))
        v = jnp.asarray(v)
        self.dtype = _common_dtype(A, self.M, v)

        self.num_iter = 0
        # the three tridiagonal entries of the current Hessenberg column
        self.h = jnp.zeros([3] + list(self.tail), dtype=self.dtype)
        self.is_invariant = False

        p = v
        v_ = self.M @ p if Mv is None else Mv
        self.vnorm = jnp.sqrt(self.inner(p, v_)) if Mv_norm is None else Mv_norm

        safe = jnp.where(self.vnorm != 0.0, self.vnorm, 1.0)
        self.p_old = None
        self.p = p / safe
        self.v = v_ / safe

    def __iter__(self):
        return self

    def __next__(self):
        if self.is_invariant:
            raise ArgumentError(_INVARIANT_MSG)

        Av = jnp.asarray(self.A @ self.v)

        h = self.h
        if self.num_iter > 0:
            # copy the old lower-diagonal entry to the upper diagonal
            h = h.at[0].set(h[2])
            Av = Av - h[0] * self.p_old

        alpha = self.inner(self.v, Av)
        h = h.at[1].set(alpha)
        Av = Av - alpha * self.p

        MAv = self.M @ Av
        beta = jnp.sqrt(self.inner(Av, MAv))
        h = h.at[2].set(beta)
        self.h = h

        if bool(np.all(np.asarray(beta) <= 1.0e-14)):
            self.is_invariant = True
            self.v = None
            self.p = None
        else:
            Hk1k = jnp.where(beta != 0.0, beta, 1.0)
            self.p_old = self.p
            self.p = Av / Hk1k
            self.v = MAv / Hk1k

        self.num_iter += 1
        return self.v, self.h, self.p


def arnoldi_res(A, V, H, inner=None):
    """Arnoldi residual ``|| A V_n - V_{n+1} H_n ||`` (diagnostic).

    (reference: src/krylov/arnoldi.py:284-301)
    """
    invariant = H.shape[0] == H.shape[1]
    V1 = V if invariant else V[:, :-1]
    res = A @ V1 - jnp.dot(V, H)
    if inner is None:
        inner = get_default_inner(res.shape)
    return jnp.sqrt(inner(res, res))
