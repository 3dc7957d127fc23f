"""CGR — conjugate residual method (Saad, Iterative Methods 2nd ed., p. 194).

Capability parity with the reference (reference: src/krylov/cgr.py:16-100),
including its M placement (residual preconditioned once up front, ``M @ Ap``
inside the loop).  Unlike the reference, maxiter defaults to N (the reference
loops forever when unconverged with maxiter=None — upstream bug).
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import preconditioner, setup


class CgrState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    p: jnp.ndarray
    Ap: jnp.ndarray
    rAr: jnp.ndarray
    resnorm: jnp.ndarray


def cgr(
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
        return jnp.sqrt(ensure_real(inner(x, x), "<x, x>"))

    x_init = x0_arr
    r0 = jnp.asarray(b) if x0 is None else b - A @ x_init
    r0 = M @ r0

    Ar = A @ r0
    rAr = inner(r0, Ar)

    if callback is not None:
        callback(x_init, r0)

    state0 = CgrState(
        x=x_init.astype(r0.dtype),
        r=r0,
        p=r0,
        Ap=jnp.asarray(Ar),
        rAr=rAr,
        resnorm=_norm(r0),
    )

    def step(s: CgrState, criterion) -> CgrState:
        MAp = M @ s.Ap
        ApMAp = inner(s.Ap, MAp)
        alpha = s.rAr / jnp.where(ApMAp != 0.0, ApMAp, 1.0)

        x = s.x + alpha * s.p
        r = s.r - alpha * MAp

        Ar = A @ r
        rAr_new = inner(r, Ar)
        beta = rAr_new / jnp.where(s.rAr != 0.0, s.rAr, 1.0)

        p = r + beta * s.p
        Ap = Ar + beta * s.Ap
        return CgrState(x=x, r=r, p=p, Ap=Ap, rAr=rAr_new, resnorm=_norm(r))

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
