"""TFQMR — transpose-free quasi-minimal residual (Freund, SISC 1993).

An extension beyond the reference (which stops at QMR, reference:
src/krylov/qmr.py:23-160): the same quasi-minimization over the CGS
iterates, but built from ``A`` alone — no ``rmatvec`` required, so it
accepts every operator the transpose-free family does (matvec-only
callables, matrix-free stencils) while smoothing CGS's erratic residuals.

Formulation: one driver step = one TFQMR **half-step** (Saad, *Iterative
Methods for Sparse Linear Systems* 2nd ed., alg. 7.4), so the residual
history has the same resolution as scipy's ``tfqmr`` and convergence can
fire mid-pair.  The even/odd structure is branch-free: the parity is
derived from a carried counter and every update is a ``jnp.where``
selection, which keeps the step a single traced program for the compiled
``lax.while_loop`` backend.  Cost per half-step: 1 matvec + 1 ``M``
apply + 2 reductions (one recurrence inner, one norm).

Preconditioning is right-sided (``A @ M``), so ``w`` lives in the true
residual space and the reported quasi-residual bound
``tau * sqrt(j + 1)`` bounds the genuine residual norm; the solution
update carries ``M @ d`` alongside ``d`` to avoid a second ``M`` apply.

The reported ``resnorms`` are the quasi-residual **upper bounds**; on
convergence the driver overwrites the final entry with the explicit
residual norm (the library-wide double-check contract, reference:
src/krylov/cg.py:156-164), so the returned trajectory ends at the true
residual.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import initial_residual, inner_tail, preconditioner, setup


class TfqmrState(NamedTuple):
    x: jnp.ndarray
    w: jnp.ndarray  # CGS-style residual chain (true-residual space)
    u: jnp.ndarray  # current direction u_j
    v: jnp.ndarray  # v vector of the current pair (built at even steps)
    vtail: jnp.ndarray  # A u_odd + beta v  (consumed by the next even step)
    d: jnp.ndarray  # quasi-minimization direction
    dM: jnp.ndarray  # M @ d, carried to keep one M apply per half-step
    alpha: jnp.ndarray
    beta: jnp.ndarray
    rho: jnp.ndarray
    theta: jnp.ndarray
    eta: jnp.ndarray
    tau: jnp.ndarray
    j: jnp.ndarray  # completed half-steps
    resnorm: jnp.ndarray


def _guard(x):
    """Breakdown-safe denominator (the library's where-guard convention)."""
    return jnp.where(x != 0.0, x, jnp.ones_like(x))


def tfqmr(
    A,
    b,
    M=None,
    x0=None,
    inner: Optional[Callable] = None,
    tol: float = 1e-5,
    atol: float = 1.0e-15,
    maxiter: Optional[int] = None,
    callback: Optional[Callable] = None,
    backend: str = EAGER,
):
    """Solve ``A x = b`` with TFQMR (right-preconditioned by ``M``).

    ``maxiter`` counts half-steps (= matvecs), matching scipy's ``tfqmr``
    accounting; ``maxiter=None`` defaults to ``2 N`` since one Krylov
    dimension costs two half-steps.  An explicit ``maxiter`` (including
    ``maxiter=N``) is honored verbatim.

    ``callback(x, w)`` receives the CGS residual-chain vector ``w`` as
    its second argument — NOT ``b - A x`` of the quasi-minimized iterate
    (computing that would cost an extra matvec per half-step); the
    pre-loop call and the driver's final explicit re-check do use the
    true residual.
    """
    was_none = maxiter is None
    A, b, x0_arr, N, inner, maxiter = setup(
        A, b, x0=x0, inner=inner, maxiter=maxiter
    )
    if was_none:
        # a full Krylov sweep is 2N half-steps for this method
        maxiter = 2 * N
    M = preconditioner(M)

    def _norm(z):
        return jnp.sqrt(ensure_real(inner(z, z), "<w, w>"))

    x_init = x0_arr
    r0 = initial_residual(A, jnp.asarray(b), x_init, x0 is None)
    rstar = r0  # shadow vector: the customary r*_0 = r_0

    if callback is not None:
        callback(x_init, r0)

    vdtype = r0.dtype
    tail = inner_tail(inner, b)
    sdtype = jnp.result_type(vdtype)
    rdtype = jnp.finfo(sdtype).dtype if jnp.issubdtype(
        sdtype, jnp.complexfloating
    ) else sdtype

    tau0 = _norm(r0)
    state0 = TfqmrState(
        x=x_init.astype(vdtype),
        w=r0,
        u=r0,
        v=jnp.zeros_like(r0),
        vtail=jnp.zeros_like(r0),
        d=jnp.zeros_like(r0),
        dM=jnp.zeros_like(r0),
        alpha=jnp.zeros(tail, sdtype),
        beta=jnp.zeros(tail, sdtype),
        rho=inner(rstar, r0).astype(sdtype),
        theta=jnp.zeros(tail, rdtype),
        eta=jnp.zeros(tail, sdtype),
        tau=tau0.astype(rdtype),
        j=jnp.asarray(0, jnp.int32),
        resnorm=tau0,
    )

    def step(s: TfqmrState, criterion) -> TfqmrState:
        even = (s.j % 2) == 0

        Mu = M @ s.u
        Au = A @ Mu

        # even: assemble this pair's v = A u_even + beta (A u_odd + beta v)
        v = jnp.where(even, Au + s.beta * s.vtail, s.v)

        # the single recurrence inner product of the half-step:
        # <r*, v> at even steps (for alpha), <r*, w_new> at odd (for rho)
        w_odd = s.w - s.alpha * Au  # the odd-step w (alpha carried)
        ip = inner(rstar, jnp.where(even, v, w_odd))

        alpha = jnp.where(even, s.rho / _guard(ip), s.alpha)
        w = s.w - alpha * Au  # even: fresh alpha; odd: equals w_odd

        scale = s.theta * s.theta * s.eta / _guard(alpha)
        d = s.u + scale * s.d
        dM = Mu + scale * s.dM

        theta = _norm(w) / _guard(s.tau)
        c2 = 1.0 / (1.0 + theta * theta)
        tau = s.tau * theta * jnp.sqrt(c2)
        eta = c2.astype(sdtype) * alpha
        x = s.x + eta * dM

        rho = jnp.where(even, s.rho, ip)
        beta = jnp.where(even, s.beta, ip / _guard(s.rho))
        u = jnp.where(even, s.u - alpha * v, w + beta * s.u)
        vtail = jnp.where(even, s.vtail, Au + beta * v)

        j = s.j + 1
        # quasi-residual bound ||r_j|| <= tau_j sqrt(j + 1)
        resnorm = tau * jnp.sqrt((j + 1).astype(rdtype))
        return TfqmrState(
            x=x, w=w, u=u, v=v, vtail=vtail, d=d, dM=dM,
            alpha=alpha.astype(sdtype), beta=beta.astype(sdtype),
            rho=rho.astype(sdtype), theta=theta.astype(rdtype),
            eta=eta.astype(sdtype), tau=tau.astype(rdtype), j=j,
            resnorm=resnorm,
        )

    method = Method(
        step=step,
        xk=lambda s: s.x,
        explicit_resnorm=lambda xk: _norm(b - A @ xk),
        callback_args=lambda s: (s.x, s.w),
    )
    state, success, k, resnorms = run(
        state0, method, tol=tol, atol=atol, maxiter=maxiter,
        callback=callback, backend=backend,
    )
    info = Info(success, state.x, k, resnorms)
    if isinstance(success, (bool, np.bool_)):
        return state.x if success else None, info
    return state.x, info
