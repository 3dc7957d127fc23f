"""SYMMLQ for symmetric (possibly indefinite) systems.

Capability parity with the reference (reference: src/krylov/symmlq.py:16-161):
self-contained Lanczos + LQ factorization with a two-deep scalar Givens
history, optional M preconditioner, arbitrary inner product, CG-point
extraction for the returned iterate.

Functional re-design: the reference's two-deep ``c/s/ceta`` Python lists
become scalar state fields shifted by assignment; the k==0 special cases are
handled with ``jnp.where`` gates on a carried iteration counter so the same
step traces under ``lax.while_loop``.

Robustness deviation from the reference (documented): the reference crashes
on a zero right-hand side (``ceta[0]`` is still ``None`` when converged at
k=0, reference: src/krylov/symmlq.py:84-87) and divides by a zero ``beta``;
here ``ceta`` starts at 0 (so the CG point degenerates to x) and the
``beta`` divisions are guarded.  Trajectories on nonzero problems are
unchanged.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import inner_tail, preconditioner, setup


class SymmlqState(NamedTuple):
    k: jnp.ndarray
    x: jnp.ndarray
    r: jnp.ndarray
    z: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    u_old: jnp.ndarray
    v_old: jnp.ndarray
    w: jnp.ndarray
    w_bar: jnp.ndarray
    beta: jnp.ndarray
    c_cur: jnp.ndarray
    c_last: jnp.ndarray
    s_cur: jnp.ndarray
    s_last: jnp.ndarray
    ceta_cur: jnp.ndarray
    ceta_last: jnp.ndarray
    ceta_last2: jnp.ndarray
    resnorm: jnp.ndarray


def symmlq(
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
    r_init = b - A @ x_init if x0 is not None else jnp.asarray(b)

    if callback is not None:
        callback(x_init, r_init)

    resnorm0 = _norm(r_init)

    z_init = M @ r_init
    dp = inner(r_init, z_init)
    beta = jnp.sqrt(dp)
    beta1 = beta
    safe_beta = jnp.where(beta != 0.0, beta, 1.0)

    v_init = r_init / safe_beta
    u_init = z_init / safe_beta

    vdtype = u_init.dtype
    tail = inner_tail(inner, b)
    sdtype = jnp.result_type(dp)
    zeros_v = jnp.zeros(b.shape, vdtype)

    def scal(val):
        return jnp.full(tail, val, sdtype)

    state0 = SymmlqState(
        k=jnp.asarray(0, jnp.int32),
        x=x_init.astype(vdtype),
        r=r_init.astype(vdtype),
        z=z_init,
        u=u_init,
        v=v_init,
        u_old=zeros_v,
        v_old=zeros_v,
        w=zeros_v,
        w_bar=u_init,
        beta=beta * jnp.ones(tail, sdtype),
        c_cur=scal(1.0),
        c_last=scal(1.0),
        s_cur=scal(0.0),
        s_last=scal(0.0),
        ceta_cur=scal(0.0),
        ceta_last=scal(0.0),
        ceta_last2=scal(0.0),
        resnorm=resnorm0,
    )

    def step(s: SymmlqState, criterion) -> SymmlqState:
        k = s.k
        later = k > 0  # the reference skips the basis/solution shift at k == 0

        safe_b = jnp.where(s.beta != 0.0, s.beta, 1.0)
        v_old = jnp.where(later, s.v, s.v_old)
        u_old = jnp.where(later, s.u, s.u_old)
        v = jnp.where(later, s.r * (1.0 / safe_b), s.v)
        u = jnp.where(later, s.z * (1.0 / safe_b), s.u)
        w = jnp.where(later, s.c_cur * s.w_bar + s.s_cur * u, s.w)
        w_bar = jnp.where(later, -s.s_cur * s.w_bar + s.c_cur * u, s.w_bar)
        x = jnp.where(later, s.x + s.ceta_cur * w, s.x)
        ceta_last2 = jnp.where(later, s.ceta_last, s.ceta_last2)
        ceta_last = jnp.where(later, s.ceta_cur, s.ceta_last)

        # Lanczos
        r = A @ u
        alpha = inner(u, r)
        z = M @ r
        r = r - alpha * v - s.beta * v_old
        z = z - alpha * u - s.beta * u_old

        beta_old = s.beta
        dp = inner(r, z)
        beta_new = jnp.sqrt(dp)

        # LQ factorization update
        c_last2, c_last = s.c_last, s.c_cur
        s_last2, s_last = s.s_last, s.s_cur
        gamma_bar = c_last * alpha - c_last2 * s_last * beta_old
        gamma = jnp.sqrt(gamma_bar * gamma_bar + beta_new * beta_new)
        delta = s_last * alpha + c_last2 * c_last * beta_old
        epsilon = s_last2 * beta_old

        c_cur = gamma_bar / gamma
        s_cur = beta_new / gamma

        ceta_cur = jnp.where(
            k == 0,
            beta1 / gamma,
            -(delta * ceta_last + epsilon * ceta_last2) / gamma,
        )

        return SymmlqState(
            k=k + 1,
            x=x,
            r=r,
            z=z,
            u=u,
            v=v,
            u_old=u_old,
            v_old=v_old,
            w=w,
            w_bar=w_bar,
            beta=beta_new.astype(s.beta.dtype),
            c_cur=c_cur.astype(sdtype),
            c_last=c_last,
            s_cur=s_cur.astype(sdtype),
            s_last=s_last,
            ceta_cur=ceta_cur.astype(sdtype),
            ceta_last=ceta_last,
            ceta_last2=ceta_last2,
            resnorm=_norm(r),
        )

    def xout_of(s: SymmlqState):
        # move to the CG point
        ceta_bar = s.ceta_cur / jnp.where(s.c_cur != 0.0, s.c_cur, 1.0e-15)
        return s.x + ceta_bar * s.w_bar

    method = Method(
        step=step,
        xk=xout_of,
        explicit_resnorm=lambda xk: _norm(b - A @ xk),
        callback_args=lambda s: (xout_of(s), s.r),
    )
    state, success, k, resnorms = run(
        state0, method, tol=tol, atol=atol, maxiter=maxiter,
        callback=callback, backend=backend,
    )
    xout = xout_of(state)
    info = Info(success, xout, k, resnorms)
    if isinstance(success, (bool, np.bool_)):
        return xout if success else None, info
    return xout, info
