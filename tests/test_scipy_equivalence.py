"""Cross-library equivalence vs SciPy (SURVEY.md §4 mode 4).

The reference compared bicg/bicgstab/cgs/qmr residual trajectories
entry-by-entry against SciPy via the scipyx wrapper (reference:
tests/test_qmr.py:60-121 etc.).  scipyx is not available here, so the
trajectories are reconstructed from SciPy's per-iteration callbacks
(explicit residuals of the callback iterates) and compared against our
histories; mathematically identical recurrences keep these aligned to
~1e-8 on the small well-conditioned zoo systems.
"""

import numpy as np
import pytest
import scipy.sparse.linalg as spla

import krylov_tpu as krylov

from . import linear_problems as lp


def _spd():
    A, b = lp.spd_dense((5,))
    return np.asarray(A, dtype=float), np.asarray(b, dtype=float)


def _unsym():
    A, b = lp.real_unsymmetric()
    return np.asarray(A, dtype=float), np.asarray(b, dtype=float)


def _scipy_trajectory(scipy_solver, A, b, maxiter, **kw):
    """Explicit residuals of scipy's callback iterates (incl. x0 = 0)."""
    resnorms = [np.linalg.norm(b)]

    def cb(xk):
        resnorms.append(np.linalg.norm(b - A @ xk))

    x, _ = scipy_solver(A, b, rtol=1e-12, atol=0.0, maxiter=maxiter,
                        callback=cb, **kw)
    return np.array(resnorms), x


@pytest.mark.parametrize(
    "ours,theirs,problem",
    [
        (krylov.cg, spla.cg, _spd),
        (krylov.bicgstab, spla.bicgstab, _unsym),
        (krylov.cgs, spla.cgs, _unsym),
        (krylov.qmr, spla.qmr, _unsym),
        (krylov.bicg, spla.bicg, _unsym),
    ],
)
def test_trajectory_matches_scipy(ours, theirs, problem):
    A, b = problem()
    maxiter = 12
    ref, x_ref = _scipy_trajectory(theirs, A, b, maxiter)
    sol, info = ours(A, b, tol=1e-12, atol=0.0, maxiter=maxiter)

    m = min(len(ref), len(info.resnorms))
    got = np.asarray(info.resnorms[:m], dtype=float)
    # explicit-vs-recurrence residuals: entry-wise agreement to ~1e-8 on
    # these tiny well-conditioned systems (the reference pinned 1e-11..1e-12
    # against scipyx's internal recurrence values; callback residuals add
    # one explicit-evaluation rounding)
    np.testing.assert_allclose(got, ref[:m], rtol=1e-7, atol=1e-10)

    if info.success:
        np.testing.assert_allclose(
            np.asarray(info.xk), x_ref, rtol=1e-6, atol=1e-9
        )


def test_gmres_solution_matches_scipy():
    A, b = _unsym()
    x_ref, code = spla.gmres(A, b, rtol=1e-12, atol=0.0, maxiter=5,
                             restart=5)
    sol, info = krylov.gmres(A, b, tol=1e-12, atol=0.0, maxiter=5)
    np.testing.assert_allclose(np.asarray(info.xk), x_ref, rtol=1e-6, atol=1e-9)
