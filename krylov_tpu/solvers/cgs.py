"""CGS — conjugate gradients squared (Sonneveld).

Capability parity with the reference (reference: src/krylov/cgs.py:24-117):
squared transpose-free recurrence, SPD preconditioner M, arbitrary inner.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import initial_residual, inner_tail, preconditioner, setup


class CgsState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    q: jnp.ndarray
    rho: jnp.ndarray
    resnorm: jnp.ndarray


def cgs(
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
    A, b, x0_arr, N, inner, maxiter = setup(A, b, x0=x0, inner=inner, maxiter=maxiter)
    M = preconditioner(M)

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, M @ x), "<x, M x>"))

    x_init = x0_arr
    r0 = initial_residual(A, jnp.asarray(b), x_init, x0 is None)
    rp = r0  # common but arbitrary choice of the shadow vector

    if callback is not None:
        callback(x_init, r0)

    vdtype = r0.dtype
    tail = inner_tail(inner, b)
    sdtype = jnp.result_type(vdtype)

    state0 = CgsState(
        x=x_init.astype(vdtype),
        r=r0,
        p=jnp.zeros_like(r0),
        q=jnp.zeros_like(r0),
        rho=jnp.full(tail, 1.0, sdtype),
        resnorm=_norm(r0),
    )

    def step(s: CgsState, criterion) -> CgsState:
        rho = inner(rp, s.r)
        beta = rho / jnp.where(s.rho != 0.0, s.rho, 1.0)
        u = s.r + beta * s.q
        p = u + beta * (s.q + beta * s.p)

        v = A @ (M @ p)
        sigma = inner(rp, v)
        alpha = rho / jnp.where(sigma != 0.0, sigma, 1.0)

        q = u - alpha * v
        u_ = M @ (u + q)

        x = s.x + alpha * u_
        r = s.r - alpha * (A @ u_)
        return CgsState(
            x=x, r=r, p=p, q=q, rho=rho.astype(sdtype), resnorm=_norm(r)
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
