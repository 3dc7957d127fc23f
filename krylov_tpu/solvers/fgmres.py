"""FGMRES — flexible GMRES (Saad 1993).

Extension beyond the reference: GMRES whose right preconditioner may
CHANGE every iteration, so the preconditioner can itself be an iterative
method (a few CG/Chebyshev steps, a multigrid cycle, a learned model...).
The flexible basis ``Z`` stores each preconditioned direction
``z_j = M_j v_j`` explicitly; the solution is assembled as
``x = x0 + Z y`` from the least-squares coefficients of the Arnoldi
Hessenberg system (Givens-QR, same primitives as :func:`gmres`).

``M`` may be an operator (fixed), a callable ``v -> z``, or a callable
``(j, v) -> z`` receiving the iteration index.  Host-stepped (eager) like
the reference's solvers -- the inner preconditioner is arbitrary Python.
Supports ``restart=m`` cycles.
"""

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from .._info import Info
from .._inner import ensure_real, get_default_inner
from ..givens import apply_givens, givens
from ._common import setup


def _apply_M(M, j, v):
    if M is None:
        return v
    if callable(M) and not hasattr(M, "__matmul__"):
        try:
            return M(j, v)
        except TypeError:
            return M(v)
    return M @ v


def fgmres(
    A,
    b,
    M=None,
    x0=None,
    inner: Optional[Callable] = None,
    tol: float = 1e-5,
    atol: float = 1.0e-15,
    maxiter: Optional[int] = None,
    restart: Optional[int] = None,
    callback: Optional[Callable] = None,
):
    """Flexible GMRES for general square ``A`` (single RHS)."""
    A, b, x0_arr, N, inner, maxiter = setup(
        A, b, x0=x0, inner=inner, maxiter=maxiter
    )
    if b.ndim != 1:
        raise ValueError("fgmres supports a single right-hand side")
    if inner is None:
        inner = get_default_inner(b.shape)

    def norm(v):
        return jnp.sqrt(ensure_real(inner(v, v), "<v, v>"))

    x = x0_arr
    r = b - jnp.asarray(A @ x)
    resnorms = [float(norm(r))]
    criterion = max(tol * resnorms[0], atol)
    if callback is not None:
        callback(x, r)

    m = maxiter if restart is None else min(restart, maxiter)
    total = 0
    success = False

    while total < maxiter and not success:
        beta = norm(r)
        if float(beta) <= criterion:
            success = True
            break
        safe = jnp.where(beta != 0, beta, 1.0)
        V = [r / safe]
        Z = []
        dtype = jnp.result_type(r.dtype, np.result_type(getattr(A, "dtype", float)))
        cycle = min(m, maxiter - total)
        H = jnp.zeros((cycle + 1, cycle), dtype)
        g = jnp.zeros(cycle + 1, dtype).at[0].set(beta)
        rots = []
        j = 0
        while j < cycle:
            z = jnp.asarray(_apply_M(M, total + j, V[j]))
            w = jnp.asarray(A @ z)
            # modified Gram-Schmidt
            for i in range(j + 1):
                hij = inner(V[i], w)
                H = H.at[i, j].set(hij)
                w = w - hij * V[i]
            hnext = norm(w)
            H = H.at[j + 1, j].set(hnext)
            Z.append(z)
            breakdown = bool(np.asarray(hnext) <= 1e-14 * max(1.0, float(beta)))
            if not breakdown:
                V.append(w / hnext)
            # apply stored rotations, generate the new one
            for i, G in enumerate(rots):
                H = H.at[i : i + 2, j].set(apply_givens(G, H[i : i + 2, j]))
            G, _ = givens(H[j : j + 2, j])
            rots.append(G)
            H = H.at[j : j + 2, j].set(apply_givens(G, H[j : j + 2, j]))
            g = g.at[j : j + 2].set(apply_givens(G, g[j : j + 2]))

            total += 1
            j += 1
            resnorms.append(float(jnp.abs(g[j])))
            if callback is not None:
                # reference contract: callback fires every iteration with
                # the current iterate (assembled on demand)
                import jax.scipy.linalg as jsl

                y_cb = jsl.solve_triangular(H[:j, :j], g[:j], lower=False)
                x_cb = x + sum(
                    (c * z for c, z in zip(y_cb, Z)),
                    jnp.zeros_like(x).astype(dtype),
                )
                callback(x_cb, b - jnp.asarray(A @ x_cb))
            if resnorms[-1] <= criterion or breakdown or total >= maxiter:
                break

        # assemble the cycle's iterate: j x j triangular solve (H is upper
        # triangular after the rotation sweep)
        import jax.scipy.linalg as jsl

        y = (
            jsl.solve_triangular(H[:j, :j], g[:j], lower=False)
            if j
            else jnp.zeros(0, dtype)
        )
        dx = sum((c * z for c, z in zip(y, Z)), jnp.zeros_like(x).astype(dtype))
        x = x + dx
        r = b - jnp.asarray(A @ x)
        # explicit-residual re-check (reference convergence contract)
        explicit = float(norm(r))
        resnorms[-1] = explicit
        if explicit <= criterion:
            success = True
            break

    info = Info(
        success, x, total, np.asarray(resnorms, dtype=float)
    )
    return (x if success else None), info
