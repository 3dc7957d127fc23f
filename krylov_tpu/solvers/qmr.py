"""QMR — quasi-minimal residual (Freund & Nachtigal), coupled two-term form.

Capability parity with the reference (reference: src/krylov/qmr.py:23-160):
split Ml/Mr preconditioning with adjoint applications on A, Ml, Mr;
quasi-residual scalar recurrence (theta, gamma, eta); breakdown guards as
``where`` selects.  The k==0 initializations of p/q/d/s collapse into the
general recurrence by zero-initializing those vectors (the correction terms
then vanish exactly).
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import initial_residual, inner_tail, preconditioner, setup


class QmrState(NamedTuple):
    x: jnp.ndarray
    r: jnp.ndarray
    v_: jnp.ndarray
    y: jnp.ndarray
    w_: jnp.ndarray
    z: jnp.ndarray
    p: jnp.ndarray
    q: jnp.ndarray
    d: jnp.ndarray
    s: jnp.ndarray
    rho: jnp.ndarray
    xi: jnp.ndarray
    gamma: jnp.ndarray
    eta: jnp.ndarray
    theta: jnp.ndarray
    epsilon: jnp.ndarray
    resnorm: jnp.ndarray


def qmr(
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
    A, b, x0_arr, N, inner, maxiter = setup(A, b, x0=x0, inner=inner, maxiter=maxiter, needs_rmatvec=True)
    Ml = preconditioner(Ml)
    Mr = preconditioner(Mr)

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, Ml @ x), "<x, Ml x>"))

    x_init = x0_arr
    r0 = initial_residual(A, jnp.asarray(b), x_init, x0 is None)

    if callback is not None:
        callback(x_init, r0)

    v_ = r0
    y = Ml @ v_
    rho0 = _norm(y)
    w_ = r0
    z = Mr.rmatvec(w_)
    xi0 = _norm(z)

    vdtype = jnp.result_type(y.dtype, z.dtype)
    tail = inner_tail(inner, b)
    rdtype = rho0.dtype
    cdtype = jnp.result_type(vdtype)

    def rscal(val):
        return jnp.full(tail, val, rdtype)

    def cscal(val):
        return jnp.full(tail, val, cdtype)

    zeros_v = jnp.zeros(b.shape, vdtype)
    state0 = QmrState(
        x=x_init.astype(vdtype),
        r=r0.astype(vdtype),
        v_=v_.astype(vdtype),
        y=y.astype(vdtype),
        w_=w_.astype(vdtype),
        z=z.astype(vdtype),
        p=zeros_v,
        q=zeros_v,
        d=zeros_v,
        s=zeros_v,
        rho=rho0,
        xi=xi0,
        gamma=rscal(1.0),
        eta=cscal(-1.0),
        theta=rscal(1.0),
        epsilon=cscal(1.0),
        resnorm=_norm(r0),
    )

    def step(st: QmrState, criterion) -> QmrState:
        safe_rho = jnp.where(st.rho != 0.0, st.rho, 1.0)
        safe_xi = jnp.where(st.xi != 0.0, st.xi, 1.0)
        v = st.v_ / safe_rho
        y = st.y / safe_rho
        w = st.w_ / safe_xi
        z = st.z / safe_xi

        delta = inner(z, y)
        y_ = Mr @ y
        z_ = Ml.rmatvec(z)

        delta_eps = delta / jnp.where(st.epsilon != 0.0, st.epsilon, 1.0)
        p = y_ - (st.xi * delta_eps) * st.p
        q = z_ - (st.rho * delta_eps) * st.q

        p_ = A @ p
        epsilon = inner(q, p_)
        beta = epsilon / jnp.where(delta != 0.0, delta, 1.0)

        v_ = p_ - beta * v
        y = Ml @ v_
        rho_new = _norm(y)

        w_ = A.rmatvec(q) - beta * w
        z = Mr.rmatvec(w_)
        xi = _norm(z)

        gamma_old_abs_beta = st.gamma * jnp.abs(beta)
        theta = rho_new / jnp.where(gamma_old_abs_beta != 0.0, gamma_old_abs_beta, 1.0)
        gamma = 1.0 / jnp.sqrt(1.0 + theta**2)
        beta_gamma_old2 = beta * st.gamma**2
        eta = (
            -st.eta
            * st.rho
            * gamma**2
            / jnp.where(beta_gamma_old2 != 0.0, beta_gamma_old2, 1.0)
        )

        coeff = (st.theta * gamma) ** 2
        d = eta * p + coeff * st.d
        s = eta * p_ + coeff * st.s

        x = st.x + d
        r = st.r - s
        return QmrState(
            x=x, r=r, v_=v_, y=y, w_=w_, z=z, p=p, q=q, d=d, s=s,
            rho=rho_new, xi=xi,
            gamma=gamma.astype(rdtype),
            eta=eta.astype(cdtype),
            theta=theta.astype(rdtype),
            epsilon=epsilon.astype(cdtype),
            resnorm=_norm(r),
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
