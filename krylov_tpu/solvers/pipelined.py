"""Pipelined (single-reduction) CG — Ghysels & Vanroose 2014.

A distribution-first extension with no reference counterpart: standard CG
issues TWO sequentially-dependent reductions per iteration (<p, Ap>, then
<r, M r> after the update — SURVEY.md §3.2 calls these the per-iteration
latency floor of the distributed build).  The pipelined recurrences carry
the auxiliary vectors ``w = A u``, ``s = A p``, ``z = A q``, ``q = M w``
so that BOTH scalars of an iteration — gamma = <r, u> and delta = <w, u>
— plus the residual norm are available from the SAME pair of vectors and
fold into ONE fused reduction (a single ``psum`` of a stacked triple when
sharded), and the matvec/preconditioner applications are independent of
that reduction, so XLA can overlap them with the collective.

The price is the textbook one: extra vector storage (4 more vectors), one
extra matvec-recurrence per iteration, and residual drift — the recurrence
residual slowly decouples from the true residual, so this solver
periodically REPLACES the recurrence vectors with explicitly computed
ones (every ``replace_every`` iterations; Cools et al. 2018 analyze why
this restores attainable accuracy).

API matches every other solver: ``cg_pipelined(A, b, M=, inner=, ...)``.
Pass ``fused_inner`` (stacked 3-way inner product) to control how the
combined reduction is computed; by default three ``inner`` calls are
issued and XLA fuses them on a single device.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from .._operators import Product
from ._common import preconditioner, setup


class PipeCGState(NamedTuple):
    k: jnp.ndarray
    x: jnp.ndarray
    r: jnp.ndarray      # residual (recurrence)
    u: jnp.ndarray      # M r
    w: jnp.ndarray      # A u
    p: jnp.ndarray      # search direction
    s: jnp.ndarray      # A p
    q: jnp.ndarray      # M s
    z: jnp.ndarray      # A q
    gamma: jnp.ndarray
    alpha: jnp.ndarray
    resnorm: jnp.ndarray


def cg_pipelined(
    A,
    b,
    M=None,
    inner: Optional[Callable] = None,
    fused_inner: Optional[Callable] = None,
    x0=None,
    tol: float = 1e-5,
    atol: float = 1.0e-15,
    maxiter: Optional[int] = None,
    replace_every: int = 50,
    callback: Optional[Callable] = None,
    backend: str = EAGER,
):
    """Single-reduction pipelined CG for Hermitian positive definite A."""
    A, b, x0_arr, N, inner, maxiter = setup(
        A, b, x0=x0, inner=inner, maxiter=maxiter
    )
    M_op = preconditioner(M)

    if fused_inner is None:
        def fused_inner(pairs):
            return tuple(inner(a, c) for (a, c) in pairs)

    def explicit_state(x, k, alpha_like=None, gamma_like=None):
        r = b - A @ x
        u = M_op @ r
        w = jnp.asarray(A @ u)
        gamma, rr = fused_inner(((r, u), (r, r)))
        gamma = ensure_real(gamma, "<r, M r>")
        rr = ensure_real(rr, "<r, r>")
        return r, u, w, gamma, jnp.sqrt(rr)

    r0, u0, w0, gamma0, resnorm0 = explicit_state(x0_arr, 0)

    if callback is not None:
        callback(x0_arr, r0)

    vdtype = jnp.result_type(u0.dtype, w0.dtype)
    zeros = jnp.zeros(u0.shape, vdtype)
    state0 = PipeCGState(
        k=jnp.asarray(0, jnp.int32),
        x=x0_arr.astype(vdtype),
        r=r0.astype(vdtype),
        u=u0.astype(vdtype),
        w=w0.astype(vdtype),
        p=zeros, s=zeros, q=zeros, z=zeros,
        gamma=gamma0,
        alpha=jnp.ones_like(gamma0),
        resnorm=resnorm0,
    )

    def step(st: PipeCGState, criterion) -> PipeCGState:
        # ONE fused reduction per iteration.  Besides the pipelined-CG
        # scalars gamma = <r,u> and delta = <w,u>, it carries the five
        # inner products that let the POST-update residual norm be recurred
        # without a second reduction:
        #   ||r - alpha*s||^2 = rr - 2 alpha Re<r,s> + alpha^2 <s,s>
        # with <r,s>, <s,s> expanded through s = w + beta*s_old.
        gamma, delta, rr, rw, rs_o, ww, ws_o, ss_o = fused_inner((
            (st.r, st.u), (st.w, st.u), (st.r, st.r), (st.r, st.w),
            (st.r, st.s), (st.w, st.w), (st.w, st.s), (st.s, st.s),
        ))
        gamma = ensure_real(gamma, "<r, M r>")
        delta = ensure_real(delta, "<w, M r>")
        rr = jnp.real(rr)
        # independent of the scalars above -> overlappable with the psum
        m = M_op @ st.w
        n = jnp.asarray(A @ m)

        first = st.k == 0
        safe_gold = jnp.where(st.gamma != 0, st.gamma, 1.0)
        beta = jnp.where(first, 0.0, gamma / safe_gold)
        denom = delta - beta * gamma / jnp.where(st.alpha != 0, st.alpha, 1.0)
        alpha = gamma / jnp.where(denom != 0, denom, 1.0)

        z = n + beta * st.z
        q = m + beta * st.q
        s = st.w + beta * st.s
        p = st.u + beta * st.p
        x = st.x + alpha * p
        r = st.r - alpha * s
        u = st.u - alpha * q
        w = st.w - alpha * z

        rs = jnp.real(rw) + beta * jnp.real(rs_o)
        ss = (
            jnp.real(ww)
            + 2.0 * beta * jnp.real(ws_o)
            + beta * beta * jnp.real(ss_o)
        )
        rr_new = jnp.maximum(rr - 2.0 * alpha * rs + alpha * alpha * ss, 0.0)

        # periodic residual replacement (Cools et al. 2018): recompute ALL
        # recurrence vectors explicitly -- r/u/w and the direction images
        # s = A p, q = M s, z = A q.  Refreshing only the residual chain
        # leaves the direction chain inconsistent and destabilizes the
        # recurrence instead of fixing it (observed in f32).
        k1 = st.k + 1
        do_replace = (k1 % replace_every) == 0

        def replaced(operands):
            x_, p_ = operands
            rr_ = (b - A @ x_).astype(vdtype)
            uu_ = (M_op @ rr_).astype(vdtype)
            ww_ = jnp.asarray(A @ uu_).astype(vdtype)
            ss_ = jnp.asarray(A @ p_).astype(vdtype)
            qq_ = (M_op @ ss_).astype(vdtype)
            zz_ = jnp.asarray(A @ qq_).astype(vdtype)
            return rr_, uu_, ww_, ss_, qq_, zz_

        if backend == EAGER:
            if bool(np.asarray(do_replace)):
                r, u, w, s, q, z = replaced((x, p))
        else:
            r, u, w, s, q, z = lax.cond(
                do_replace, replaced,
                lambda operands: (r, u, w, s, q, z), (x, p),
            )

        return PipeCGState(
            k=k1, x=x, r=r, u=u, w=w, p=p, s=s, q=q, z=z,
            gamma=gamma, alpha=alpha,
            resnorm=jnp.sqrt(rr_new),
        )

    method = Method(
        step=step,
        xk=lambda s: s.x,
        explicit_resnorm=lambda xk: explicit_state(xk, 0)[4],
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
