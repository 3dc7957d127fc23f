"""BiCGSTAB (van der Vorst) with left/right preconditioning.

Capability parity with the reference (reference: src/krylov/bicgstab.py:24-144),
including its mid-iteration early exit: after computing the half-step the
reference evaluates the explicit residual norm of the *previous* iterate and,
if it already satisfies the criterion, overwrites the last history entry and
stops without completing the iteration (reference:
src/krylov/bicgstab.py:117-123).  That exit is carried here as an
``early_success`` flag on the state pytree which both drivers honor.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import initial_residual, inner_tail, preconditioner, setup


class BicgstabState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    rho: jnp.ndarray
    alpha: jnp.ndarray
    omega: jnp.ndarray
    resnorm: jnp.ndarray
    early_success: jnp.ndarray


def bicgstab(
    A,
    b,
    Ml=None,
    Mr=None,
    x0=None,
    inner: Optional[Callable] = None,
    tol: float = 1e-5,
    atol: float = 1.0e-15,
    maxiter: Optional[int] = None,
    callback: Optional[Callable] = None,
    backend: str = EAGER,
):
    A, b, x0_arr, N, inner, maxiter = setup(A, b, x0=x0, inner=inner, maxiter=maxiter)
    Ml = preconditioner(Ml)
    Mr = preconditioner(Mr)

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, Ml @ x), "<x, Ml x>"))

    x_init = x0_arr
    r0 = initial_residual(A, jnp.asarray(b), x_init, x0 is None)
    r0_shadow = r0  # common but arbitrary choice

    if callback is not None:
        callback(x_init, r0)

    resnorm0 = _norm(r0)
    vdtype = r0.dtype
    tail = inner_tail(inner, b)
    sdtype = jnp.result_type(vdtype)

    def scal(val):
        return jnp.full(tail, val, sdtype)

    state0 = BicgstabState(
        x=x_init.astype(vdtype),
        r=r0,
        p=jnp.zeros_like(r0),
        v=jnp.zeros_like(r0),
        rho=scal(1.0),
        alpha=scal(1.0),
        omega=scal(1.0),
        resnorm=resnorm0,
        early_success=jnp.asarray(False),
    )

    def step(s: BicgstabState, criterion) -> BicgstabState:
        rho = inner(r0_shadow, s.r)
        rho_old_omega = s.rho * s.omega
        beta = rho * s.alpha / jnp.where(rho_old_omega != 0.0, rho_old_omega, 1.0)

        p = s.r + beta * (s.p - s.omega * s.v)
        y = Mr @ (Ml @ p)
        v = A @ y

        r0v = inner(r0_shadow, v)
        alpha = rho / jnp.where(r0v != 0.0, r0v, 1.0)
        s_vec = s.r - alpha * v
        h = s.x + alpha * y

        # mid-iteration convergence probe on the previous iterate
        # (reference quirk: uses x, not h — src/krylov/bicgstab.py:119)
        resnorm_h = _norm(Ml @ (b - A @ s.x))
        early = jnp.all(resnorm_h <= criterion)

        Ml_s = Ml @ s_vec
        z = Mr @ Ml_s
        t = A @ z
        Ml_t = Ml @ t
        tt = inner(Ml_t, Ml_t)
        omega = inner(Ml_t, Ml_s) / jnp.where(tt != 0.0, tt, 1.0)

        x_new = h + omega * z
        r_new = s_vec - omega * t

        return BicgstabState(
            x=jnp.where(early, s.x, x_new),
            r=jnp.where(early, s.r, r_new),
            p=p,
            v=v,
            rho=rho.astype(sdtype),
            alpha=alpha.astype(sdtype),
            omega=jnp.where(early, s.omega, omega).astype(sdtype),
            resnorm=jnp.where(early, resnorm_h, _norm(r_new)),
            early_success=early,
        )

    method = Method(
        step=step,
        xk=lambda s: s.x,
        explicit_resnorm=lambda xk: _norm(b - A @ xk),
        callback_args=lambda s: (s.x, s.r),
    )
    state, success, k, resnorms = run(
        state0, method, tol=tol, atol=atol, maxiter=maxiter,
        callback=callback, backend=backend,
    )
    info = Info(success, state.x, k, resnorms)
    if isinstance(success, (bool, np.bool_)):
        return state.x if success else None, info
    return state.x, info
