"""Chebyshev iteration (matvec-only, needs eigenvalue estimates).

Capability parity with the reference (reference: src/krylov/chebyshev.py:12-99):
``eigenvalue_estimates=(lmin, lmax)``, optional M, arbitrary inner.  The
k==0 / k==1 coefficient special cases become ``where`` gates on a carried
counter (p is zero-initialized so ``p = z + beta * 0`` is exact at k==0).
"""

from typing import Callable, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import inner_tail, preconditioner, setup


class ChebyshevState(NamedTuple):
    k: jnp.ndarray
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    alpha: jnp.ndarray
    resnorm: jnp.ndarray


def chebyshev(
    A,
    b,
    eigenvalue_estimates: Tuple[float, float],
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

    assert len(eigenvalue_estimates) == 2
    assert eigenvalue_estimates[0] <= eigenvalue_estimates[1]
    lmin, lmax = eigenvalue_estimates
    d = (lmax + lmin) / 2
    c = (lmax - lmin) / 2

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, M @ x), "<x, M x>"))

    x_init = x0_arr
    r0 = jnp.asarray(b) if x0 is None else b - A @ x_init

    if callback is not None:
        callback(x_init, r0)

    tail = inner_tail(inner, b)
    rdtype = jnp.result_type(r0.real.dtype if jnp.iscomplexobj(r0) else r0.dtype)
    state0 = ChebyshevState(
        k=jnp.asarray(0, jnp.int32),
        x=x_init.astype(r0.dtype),
        r=r0,
        p=jnp.zeros_like(M @ r0),
        alpha=jnp.zeros(tail, rdtype),
        resnorm=_norm(r0),
    )

    def step(s: ChebyshevState, criterion) -> ChebyshevState:
        z = M @ s.r
        factor = jnp.where(s.k > 1, 0.25, 0.5)
        beta = jnp.where(s.k == 0, 0.0, factor * (c * s.alpha) ** 2)
        alpha = 1.0 / (d - beta / jnp.where(s.alpha != 0.0, s.alpha, 1.0))
        p = z + beta * s.p  # exact for k == 0 since p0 == 0 and beta == 0
        x = s.x + alpha * p
        r = s.r - alpha * (A @ p)
        return ChebyshevState(
            k=s.k + 1, x=x, r=r, p=p,
            alpha=alpha.astype(s.alpha.dtype), resnorm=_norm(r),
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
