"""Multilevel preconditioning three ways: geometric V-cycle on a
constant stencil, Galerkin multigrid on a variable-coefficient stencil,
and algebraic multigrid on a raw CSR matrix.

    python examples/multigrid_solve.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax

jax.config.update("jax_enable_x64", True)  # tol=1e-8 needs f64

import jax.numpy as jnp
import numpy as np
import scipy.sparse

import krylov_tpu as krylov
from krylov_tpu import AMGPreconditioner, MultigridPreconditioner
from krylov_tpu.ops import stencil

INNER = lambda u, v: jnp.sum(u * v)  # noqa: E731


def main():
    n = 256
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)))

    # 1. constant-coefficient Poisson: rediscretized geometric V-cycle
    Ac = stencil.poisson_2d_const(n, n, dtype=np.float64)
    _, plain = krylov.cg(Ac, b, inner=INNER, tol=1e-8, maxiter=2000)
    M = MultigridPreconditioner(Ac)
    sol, info = krylov.cg(Ac, b, M=M, inner=INNER, tol=1e-8, maxiter=2000)
    print(f"const-stencil MG-CG: {info.numsteps} iters "
          f"(plain CG: {plain.numsteps}); {M.n_levels} levels")

    # 2. variable-coefficient diffusion: exact Galerkin coarse stencils
    X, Y = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                       indexing="ij")
    a = 1.0 + 0.9 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    Av = stencil.diffusion_2d(a)
    Mv = MultigridPreconditioner(Av)
    _, iv = krylov.cg(Av, b, M=Mv, inner=INNER, tol=1e-8, maxiter=2000)
    print(f"Galerkin MG-CG (variable coefficients): {iv.numsteps} iters")

    # 3. raw CSR matrix (no grid structure exposed): algebraic multigrid
    T = scipy.sparse.diags(
        [-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)], [-1, 0, 1]
    )
    Asp = (scipy.sparse.kron(scipy.sparse.eye(n), T)
           + scipy.sparse.kron(T, scipy.sparse.eye(n))).tocsr()
    Ma = AMGPreconditioner.from_scipy(Asp, smoother="chebyshev")
    bf = jnp.asarray(np.asarray(b).reshape(-1))
    _, ia = krylov.cg(Asp, bf, M=Ma, tol=1e-8, maxiter=2000)
    print(f"AMG-CG (CSR, chebyshev smoothing): {ia.numsteps} iters; "
          f"levels {Ma.level_sizes}")


if __name__ == "__main__":
    main()
