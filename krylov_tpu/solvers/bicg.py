"""BiCG — biconjugate gradients (two-sided recurrence).

Capability parity with the reference (reference: src/krylov/bicg.py:27-116):
SPD preconditioner M applied through both ``M @`` and ``M.rmatvec``, dual
residual pair, adjoint matvec on A.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import initial_residual, preconditioner, setup


class BicgState(NamedTuple):
    x: jnp.ndarray
    r0: jnp.ndarray  # residual
    r1: jnp.ndarray  # dual (shadow) residual
    p0: jnp.ndarray
    p1: jnp.ndarray
    rMr: jnp.ndarray
    resnorm: jnp.ndarray


def bicg(
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
    A, b, x0_arr, N, inner, maxiter = setup(A, b, x0=x0, inner=inner, maxiter=maxiter, needs_rmatvec=True)
    M = preconditioner(M)

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, M @ x), "<x, M x>"))

    x_init = x0_arr
    r_init = initial_residual(A, jnp.asarray(b), x_init, x0 is None)
    r0 = r_init
    r1 = jnp.conj(r_init)

    if callback is not None:
        callback(x_init, jnp.stack([r0, r1]))

    p0 = M @ r0
    p1 = M.rmatvec(r1)
    rMr = inner(r1, M @ r0)

    state0 = BicgState(
        x=x_init.astype(p0.dtype),
        r0=r0.astype(p0.dtype),
        r1=r1.astype(p0.dtype),
        p0=p0,
        p1=p1,
        rMr=rMr,
        resnorm=_norm(r0),
    )

    def step(s: BicgState, criterion) -> BicgState:
        Ap0 = A @ s.p0
        AHp1 = A.rmatvec(s.p1)
        pAp = inner(s.p1, Ap0)
        alpha = s.rMr / jnp.where(pAp != 0, pAp, 1.0)

        x = s.x + alpha * s.p0
        r0 = s.r0 - alpha * Ap0
        r1 = s.r1 - jnp.conj(alpha) * AHp1

        rMr_new = inner(r1, M @ r0)
        beta = rMr_new / jnp.where(s.rMr != 0, s.rMr, 1.0)

        p0 = M @ r0 + beta * s.p0
        p1 = M.rmatvec(r1) + jnp.conj(beta) * s.p1
        return BicgState(
            x=x, r0=r0, r1=r1, p0=p0, p1=p1, rMr=rMr_new, resnorm=_norm(r0)
        )

    method = Method(
        step=step,
        xk=lambda s: s.x,
        explicit_resnorm=lambda xk: _norm(b - A @ xk),
        callback_args=lambda s: (s.x, jnp.stack([s.r0, s.r1])),
    )
    state, success, k, resnorms = run(
        state0, method, tol=tol, atol=atol, maxiter=maxiter,
        callback=callback, backend=backend,
    )
    info = Info(success, state.x, k, resnorms)
    if isinstance(success, (bool, np.bool_)):
        return state.x if success else None, info
    return state.x, info
