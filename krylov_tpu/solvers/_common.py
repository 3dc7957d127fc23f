"""Shared solver preamble.

Uniform argument handling for every method (matching the reference's uniform
solver signature, reference: src/krylov/cg.py:96-113 et al.): RHS coercion,
square-shape checks, operator normalization, default inner product, default
zero initial guess, ``maxiter=None -> N``.
"""

import jax.numpy as jnp

from .._inner import get_default_inner
from .._operators import Identity, as_operator


def setup(A, b, x0=None, inner=None, maxiter=None, needs_rmatvec=False):
    b = jnp.asarray(b)
    A = as_operator(A)
    if needs_rmatvec and hasattr(A, "ensure_adjoint"):
        # two-sided solvers materialize a lazy adjoint host-side, up
        # front — inside jit (post-flatten) the host handle is gone
        A.ensure_adjoint()
    assert len(A.shape) == 2
    assert A.shape[0] == A.shape[1]
    N = A.shape[0]
    # operators may declare a native (non-flat) vector space, e.g. the
    # grid-shaped (M, ny) vectors of GridStencilOperator that avoid TPU
    # relayout copies; such solves need an explicit full-contraction inner
    vec_shape = getattr(A, "vector_shape", None)
    if vec_shape is not None and tuple(b.shape[: len(vec_shape)]) == tuple(
        vec_shape
    ):
        # native vector shape, optionally with trailing blocked-RHS axes
        if inner is None:
            raise ValueError(
                "operator-native vector shapes require an explicit inner"
            )
    else:
        assert A.shape[1] == b.shape[0]
        inner = get_default_inner(b.shape) if inner is None else inner
    maxiter = N if maxiter is None else maxiter
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    return A, b, x0, N, inner, maxiter


def preconditioner(M):
    return Identity() if M is None else as_operator(M)


def inner_tail(inner, v):
    """Shape of per-RHS scalars = shape of ``inner(v, v)``.

    For the default inner this equals ``b.shape[1:]`` (multi-RHS blocking);
    for full-contraction inners (grid-shaped vectors) it is ``()`` — deriving
    it from the inner, not the RHS shape, keeps every solver's scalar
    recurrences correct for operator-native vector spaces.
    """
    return tuple(jnp.shape(inner(v, v)))
