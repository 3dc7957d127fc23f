import pytest

import krylov_tpu as krylov

from .helpers import assert_consistent
from .linear_problems import hermitian_indefinite, hpd
from .linear_problems import spd_dense as spd
from .linear_problems import spd_rhs_0, spd_rhs_0sol0, symmetric_indefinite

PROBLEMS = [
    spd((5,)),
    spd((5, 1)),
    spd((5, 3)),
    spd_rhs_0((5,)),
    spd_rhs_0sol0(),
    hpd(),
    symmetric_indefinite(),
    hermitian_indefinite(),
]


@pytest.mark.parametrize("A_b", PROBLEMS)
def test_cg(A_b):
    A, b = A_b

    callback_counter = 0

    def callback(x, r):
        nonlocal callback_counter
        callback_counter += 1

    sol, info = krylov.cg(A, b, tol=1.0e-7, callback=callback)
    assert callback_counter == info.numsteps + 1
    assert info.success
    assert_consistent(A, b, info, sol, 1.0e-7)


@pytest.mark.parametrize("A_b", PROBLEMS)
def test_cg_while_loop(A_b):
    """The compiled (lax.while_loop) driver must match the eager trajectory."""
    import numpy as np

    A, b = A_b
    sol_e, info_e = krylov.cg(A, b, tol=1.0e-7, backend="eager")
    sol_w, info_w = krylov.cg(A, b, tol=1.0e-7, backend="while_loop")
    assert info_w.success == info_e.success
    assert info_w.numsteps == info_e.numsteps
    re, rw = np.asarray(info_e.resnorms), np.asarray(info_w.resnorms)
    assert re.shape == rw.shape
    assert np.all(np.abs(re - rw) <= 1e-12 * (1 + re))
    assert_consistent(A, b, info_w, sol_w, 1.0e-7)


def test_cg_jittable():
    """Whole solve traced inside user jit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    A, b = spd((5,))

    @jax.jit
    def solve(A, b):
        _, info = krylov.cg(A, b, tol=1.0e-7, maxiter=5, backend="while_loop")
        return info.xk, info.numsteps, info.resnorms

    xk, numsteps, buf = solve(jnp.asarray(A), jnp.asarray(b))
    res = np.linalg.norm(b - A @ np.asarray(xk))
    assert res < 1e-7 * (1 + np.linalg.norm(b))
    assert buf.shape == (6,)
