"""GCR — generalized conjugate residual (Eisenstat, Elman, Schultz 1983).

Capability parity with the reference (reference: src/krylov/gcr.py:18-97):
grows s/v direction bases, MGS-orthogonalizes the new A-image against all
previous ones.  One buffered implementation serves both drivers: bases live
in fixed ``(maxiter, N, ...)`` arrays and the MGS sweep is a masked
``fori_loop`` (trip count k), which runs fine eagerly and under
``lax.while_loop``.  maxiter defaults to N (the reference loops forever when
unconverged with maxiter=None — upstream bug).

Extension beyond the reference: a (flexible) preconditioner ``M`` — the
reference left this as an in-source TODO (reference: src/krylov/gcr.py:17).
Search directions become ``s_k = M r_k``; since GCR orthonormalizes the
A-images explicitly, this is the flexible variant and even non-constant
``M`` is admissible.  ``M=None`` reduces exactly to the reference method.
"""

from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
from jax import lax

from .._driver import EAGER, Method, run
from .._info import Info
from .._inner import ensure_real
from ._common import preconditioner, setup


class GcrState(NamedTuple):
    k: jnp.ndarray
    x: jnp.ndarray
    r: jnp.ndarray
    S: jnp.ndarray  # (maxiter, N, *tail) search directions
    V: jnp.ndarray  # (maxiter, N, *tail) their A-images, orthonormalized
    resnorm: jnp.ndarray


def gcr(
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
    M_op = preconditioner(M)

    def _norm(x):
        return jnp.sqrt(ensure_real(inner(x, x), "<x, x>"))

    x_init = x0_arr
    r0 = jnp.asarray(b) if x0 is None else b - A @ x_init

    if callback is not None:
        callback(x_init, r0)

    vdtype = jnp.result_type(r0.dtype, np.result_type(getattr(A, "dtype", float)))
    state0 = GcrState(
        k=jnp.asarray(0, jnp.int32),
        x=x_init.astype(vdtype),
        r=r0.astype(vdtype),
        S=jnp.zeros((maxiter,) + b.shape, vdtype),
        V=jnp.zeros((maxiter,) + b.shape, vdtype),
        resnorm=_norm(r0),
    )

    def step(st: GcrState, criterion) -> GcrState:
        k = st.k
        s_new = (M_op @ st.r).astype(vdtype)
        v_new = jnp.asarray(A @ s_new).astype(vdtype)

        def mgs_body(i, carry):
            v, s = carry
            alpha = inner(v, st.V[i])
            v = v - alpha * st.V[i]
            s = s - alpha * st.S[i]  # keep A s == v
            return v, s

        v_new, s_new = lax.fori_loop(0, k, mgs_body, (v_new, s_new))

        beta = _norm(v_new)
        safe = jnp.where(beta != 0.0, beta, 1.0)
        v_new = v_new / safe
        s_new = s_new / safe

        gamma = inner(b, v_new)
        x = st.x + gamma * s_new
        r = st.r - gamma * v_new
        return GcrState(
            k=k + 1,
            x=x,
            r=r,
            S=st.S.at[k].set(s_new),
            V=st.V.at[k].set(v_new),
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
