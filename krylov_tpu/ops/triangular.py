"""Small dense triangular solves, vectorized over trailing RHS dimensions.

The reference calls scipy's ``solve_triangular`` once per RHS column in a
Python loop (reference: src/krylov/gmres.py:24-38) — a LAPACK FFI crossing
per column.  Here the solve is a single on-device ``lax``-backed call vmapped
over columns, usable inside compiled solver loops.
"""

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def multi_solve_triangular(A, B, lower=False):
    """Solve ``A[:, :, t] @ y[:, t] = B[:, t]`` for every trailing index t.

    ``A`` has shape ``(k, k, *tail)``, ``B`` has ``(k, *tail)``.  Columns of B
    that are entirely zero yield zero solutions (guarding the singular-R case
    for already-converged RHS columns, same contract as the reference).
    """
    k = A.shape[0]
    tail = B.shape[1:]
    a = A.reshape(k, k, -1)
    bb = B.reshape(k, -1)

    zero_col = jnp.all(bb == 0.0, axis=0)  # (t,)
    eye = jnp.eye(k, dtype=A.dtype)
    a_safe = jnp.where(zero_col[None, None, :], eye[:, :, None], a)

    sol = jax.vmap(
        lambda aa, bbb: jsl.solve_triangular(aa, bbb, lower=lower),
        in_axes=(2, 1),
        out_axes=1,
    )(a_safe, bb)
    sol = jnp.where(zero_col[None, :], jnp.zeros_like(sol), sol)
    return sol.reshape((k,) + tail)
