"""GridStencilOperator: 2-D/3-D grid stencils vs dense/CSR ground truth.

The Pallas TPU kernel itself only runs on TPU; these CPU tests cover the
XLA grid formulation (the same code path chooses between them), the
grid-offset decomposition, and solver integration.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import krylov_tpu
from krylov_tpu.ops import stencil


@pytest.mark.parametrize(
    "make,n",
    [
        (lambda: stencil.poisson_2d(8, 16), 128),
        (lambda: stencil.poisson_2d(16, 8), 128),
        (lambda: stencil.poisson_3d(4, 5, 8), 160),
    ],
)
def test_grid_matvec_matches_csr(make, n):
    A = make()
    assert isinstance(A, stencil.GridStencilOperator)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    want = A.tocsr() @ x
    got = A @ x
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-13)


def test_grid_offset_decomposition():
    A = stencil.poisson_2d(4, 8)
    assert A.offsets == (-8, -1, 0, 1, 8)
    assert A.row_offsets == (-1, 0, 0, 0, 1)
    assert A.col_offsets == (0, -1, 0, 1, 0)

    B = stencil.poisson_3d(3, 4, 8)
    # strides: ny*nz = 32, nz = 8, 1
    assert B.ny == 8
    assert set(zip(B.row_offsets, B.col_offsets)) == {
        (-4, 0), (-1, 0), (0, -1), (0, 0), (0, 1), (1, 0), (4, 0),
    }


def test_grid_rmatvec_hermitian():
    A = stencil.poisson_2d(8, 8)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(64))
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(x)), np.asarray(A @ x), atol=1e-13
    )


def test_cg_on_grid_operator():
    A = stencil.poisson_2d(8, 16)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(128))
    sol, info = krylov_tpu.cg(A, b, tol=1e-12, maxiter=400)
    assert info.success
    r = np.asarray(b) - np.asarray(A @ sol)
    assert np.linalg.norm(r) <= 1e-11 * (1 + np.linalg.norm(np.asarray(b)))


def test_grid_multi_rhs_falls_back():
    A = stencil.poisson_2d(8, 8)
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((64, 3)))
    want = np.stack([np.asarray(A @ X[:, k]) for k in range(3)], axis=1)
    got = np.asarray(A @ X)
    np.testing.assert_allclose(got, want, atol=1e-13)


def test_pallas_kernel_interpret_mode():
    """Run the actual Pallas kernel in interpreter mode on CPU."""
    from krylov_tpu.ops.pallas_stencil import stencil2d_matvec
    import jax
    from jax.experimental import pallas as pl  # noqa: F401

    A = stencil.poisson_2d(16, 8, dtype=np.float32)
    M, ny = 16, 8
    c2 = A.coeffs.reshape(5, M, ny)
    rng = np.random.default_rng(4)
    x2 = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    want = (A @ x2.reshape(-1)).reshape(M, ny)

    with jax.disable_jit():
        import krylov_tpu.ops.pallas_stencil as ps
        import functools
        from jax.experimental import pallas as pl

        # call pallas_call with interpret=True through a small shim
        got = pl.pallas_call(
            functools.partial(
                ps._kernel,
                row_offsets=A.row_offsets,
                col_offsets=A.col_offsets,
                h=1,
                tm=8,
            ),
            grid=(2,),
            in_specs=[
                pl.BlockSpec((5, 8, ny), lambda i: (0, i, 0)),
                pl.BlockSpec((8, ny), lambda i: (i, 0)),
                pl.BlockSpec((1, 1, ny), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, 1, ny), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((8, ny), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, ny), jnp.float32),
            interpret=True,
        )(
            c2,
            x2,
            jnp.concatenate(
                [jnp.zeros((1, 1, ny), jnp.float32),
                 x2.reshape(2, 8, ny)[:-1, -1:]], axis=0),
            jnp.concatenate(
                [x2.reshape(2, 8, ny)[1:, :1],
                 jnp.zeros((1, 1, ny), jnp.float32)], axis=0),
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


# ---------------------------------------------------------------------------
# ConstStencilOperator (constant-coefficient, in-kernel boundary masks)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "make_const,make_var,n",
    [
        (
            lambda: stencil.poisson_2d_const(8, 16, dtype=np.float64),
            lambda: stencil.poisson_2d(8, 16),
            128,
        ),
        (
            lambda: stencil.poisson_3d_const(4, 5, 8, dtype=np.float64),
            lambda: stencil.poisson_3d(4, 5, 8),
            160,
        ),
    ],
)
def test_const_stencil_matches_variable(make_const, make_var, n):
    A, Av = make_const(), make_var()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n))
    np.testing.assert_allclose(
        np.asarray(A @ x), np.asarray(Av @ x), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(A @ x), np.asarray(A.tocsr() @ x), atol=1e-13
    )


def test_const_stencil_structural_nnz():
    A = stencil.poisson_2d_const(8, 16)
    # N + 2*(8*15) + 2*(7*16) interior couplings
    assert A.nnz == 128 + 2 * 8 * 15 + 2 * 7 * 16


def test_const_stencil_grid_vectors_and_rmatvec():
    A = stencil.poisson_2d_const(8, 16, dtype=np.float64)
    rng = np.random.default_rng(1)
    xg = jnp.asarray(rng.standard_normal((8, 16)))
    flat = (A @ xg.reshape(-1)).reshape(8, 16)
    np.testing.assert_allclose(np.asarray(A @ xg), np.asarray(flat), atol=1e-14)
    assert A.hermitian
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(xg)), np.asarray(A @ xg), atol=1e-14
    )


def test_const_stencil_nonsymmetric_rmatvec():
    # convection-like: asymmetric weights
    A = stencil.ConstStencilOperator(
        (6, 8),
        ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)),
        (4.0, -1.5, -0.5, -2.0, -0.25),
        dtype=np.float64,
    )
    assert not A.hermitian
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(48))
    dense = np.asarray(A.tocsr().todense())
    np.testing.assert_allclose(np.asarray(A @ x), dense @ np.asarray(x), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(A.rmatvec(x)), dense.T @ np.asarray(x), atol=1e-13
    )


def test_cg_on_const_stencil():
    A = stencil.poisson_2d_const(8, 16, dtype=np.float64)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(128))
    sol, info = krylov_tpu.cg(A, b, tol=1e-12, maxiter=400)
    assert info.success
    r = np.asarray(b) - np.asarray(A @ sol)
    assert np.linalg.norm(r) <= 1e-10 * (1 + np.linalg.norm(np.asarray(b)))


def test_const_stencil_multi_rhs():
    A = stencil.poisson_2d_const(8, 8, dtype=np.float64)
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.standard_normal((64, 3)))
    want = np.stack([np.asarray(A @ X[:, k]) for k in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(A @ X), want, atol=1e-13)


def test_cg_stencil_matches_generic_cg():
    A = stencil.poisson_2d_const(8, 16, dtype=np.float64)
    rng = np.random.default_rng(20)
    b = jnp.asarray(rng.standard_normal(128))
    sol_ref, info_ref = krylov_tpu.cg(A, b, tol=1e-12, maxiter=400)
    sol, info = krylov_tpu.cg_stencil(A, b, tol=1e-12, maxiter=400)
    assert info.success
    assert info.numsteps == info_ref.numsteps
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), atol=1e-10)
    m = min(len(info.resnorms), len(info_ref.resnorms))
    np.testing.assert_allclose(
        info.resnorms[:m], info_ref.resnorms[:m], rtol=1e-9, atol=1e-13
    )


def test_cg_stencil_grid_rhs_and_unconverged():
    A = stencil.poisson_2d_const(8, 16, dtype=np.float64)
    rng = np.random.default_rng(21)
    b2 = jnp.asarray(rng.standard_normal((8, 16)))
    sol, info = krylov_tpu.cg_stencil(A, b2, tol=1e-12, maxiter=400)
    assert info.success and sol.shape == (8, 16)
    soln, infon = krylov_tpu.cg_stencil(A, b2, tol=1e-30, atol=0.0, maxiter=3)
    assert soln is None and not infon.success


def test_cg_fused_kernels_interpret_mode():
    """Fused phase kernels in Pallas interpreter mode vs plain ops."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from krylov_tpu.ops import pallas_stencil as ps

    A = stencil.poisson_2d_const(16, 8, dtype=np.float32)
    M, ny = A.grid
    rng = np.random.default_rng(22)
    r = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    omega = jnp.float32(0.7)

    h, tm, nb = 1, 8, 2
    rt, rb = ps._halo_planes(r, nb, tm, h)
    pt, pb = ps._halo_planes(p, nb, tm, h)
    om = jnp.asarray(omega).reshape(1, 1)
    kern = functools.partial(
        ps._cg_a_kernel, bands=A.bands, h=h, tm=tm, ny=ny
    )
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        ),
        interpret=True,
    )(om, r, p, rt, rb, pt, pb)

    pn_ref = r + omega * p
    ap_ref = A @ pn_ref
    np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(pap)), float(jnp.sum(pn_ref * ap_ref)), rtol=1e-4
    )


def test_cg_fused_var_kernel_interpret_mode():
    """Variable-coefficient fused phase-A kernel (interpret mode) vs the
    operator's own matvec."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from krylov_tpu.ops import pallas_stencil as ps

    rng = np.random.default_rng(23)
    a = 0.5 + rng.random((16, 8))
    A = stencil.diffusion_2d(a, dtype=np.float32)
    M, ny = A.grid
    r = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    omega = jnp.float32(0.7)

    h, tm, nb = 1, 8, 2
    rt, rb = ps._halo_planes(r, nb, tm, h)
    pt, pb = ps._halo_planes(p, nb, tm, h)
    om = jnp.asarray(omega).reshape(1, 1)
    ndiag = A.coeffs2d.shape[0]
    kern = functools.partial(
        ps._cg_a_var_kernel, row_offsets=A.row_offsets,
        col_offsets=A.col_offsets, h=h, tm=tm, ny=ny,
    )
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((ndiag, tm, ny), lambda i: (0, i, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((tm, ny), lambda i: (i, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        ),
        interpret=True,
    )(om, jnp.asarray(A.coeffs2d, jnp.float32), r, p, rt, rb, pt, pb)

    pn_ref = r + omega * p
    ap_ref = A @ pn_ref
    np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(pap)), float(jnp.sum(pn_ref * ap_ref)), rtol=1e-4
    )


def test_cg_fused_var_jac_kernels_interpret_mode():
    """Jacobi-preconditioned fused phase kernels (interpret mode) vs the
    reference update formulas."""
    import functools
    import jax
    from jax.experimental import pallas as pl
    from krylov_tpu.ops import pallas_stencil as ps

    rng = np.random.default_rng(25)
    a = 0.5 + rng.random((16, 8))
    A = stencil.diffusion_2d(a, dtype=np.float32)
    M, ny = A.grid
    r = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    d = jnp.asarray(A.diagonal()).reshape(M, ny).astype(jnp.float32)
    dinv = 1.0 / d
    omega = jnp.float32(0.6)

    h, tm, nb = 1, 8, 2
    rt, rb = ps._halo_planes(r, nb, tm, h)
    pt, pb = ps._halo_planes(p, nb, tm, h)
    dt, db = ps._halo_planes(dinv, nb, tm, h)
    om = jnp.asarray(omega).reshape(1, 1)
    ndiag = A.coeffs2d.shape[0]
    kern = functools.partial(
        ps._cg_a_var_jac_kernel, row_offsets=A.row_offsets,
        col_offsets=A.col_offsets, h=h, tm=tm, ny=ny,
    )
    halo = pl.BlockSpec((1, h, ny), lambda i: (i, 0, 0))
    blk = pl.BlockSpec((tm, ny), lambda i: (i, 0))
    pn, ap, pap = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((ndiag, tm, ny), lambda i: (0, i, 0)),
            blk, blk, blk, halo, halo, halo, halo, halo, halo,
        ],
        out_specs=(blk, blk, pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        ),
        interpret=True,
    )(om, jnp.asarray(A.coeffs2d, jnp.float32), dinv, r, p,
      rt, rb, pt, pb, dt, db)

    pn_ref = dinv * r + omega * p
    ap_ref = A @ pn_ref
    np.testing.assert_allclose(np.asarray(pn), np.asarray(pn_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        float(jnp.sum(pap)), float(jnp.sum(pn_ref * ap_ref)), rtol=1e-4
    )

    # phase B: in-place updates + M-weighted rho partial
    alpha = jnp.float32(0.3)
    y = jnp.asarray(rng.standard_normal((M, ny)), jnp.float32)
    al = jnp.asarray(alpha).reshape(1, 1)
    yn, rn, rho = pl.pallas_call(
        ps._cg_b_jac_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  blk, blk, blk, blk, blk],
        out_specs=(blk, blk, pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))),
        out_shape=(
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((M, ny), jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
        ),
        interpret=True,
    )(al, dinv, y, r, pn, ap)
    rn_ref = r - alpha * ap
    np.testing.assert_allclose(
        np.asarray(yn), np.asarray(y + alpha * pn), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rn), np.asarray(rn_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        float(jnp.sum(rho)), float(jnp.sum(rn_ref * dinv * rn_ref)), rtol=1e-4
    )


def test_cg_stencil_jacobi_matches_generic_preconditioned_cg():
    """cg_stencil(M='jacobi') reproduces krylov_tpu.cg with a diagonal M
    (same resnorm convention sqrt(<r, M r>), same trajectory)."""
    from krylov_tpu._operators import DiagonalOperator

    rng = np.random.default_rng(26)
    a = jnp.asarray(0.5 + rng.random((8, 16)))
    A = stencil.diffusion_2d(a, dtype=np.float64)
    b = jnp.asarray(rng.standard_normal(128))
    dinv = 1.0 / jnp.asarray(A.diagonal())
    sol_ref, info_ref = krylov_tpu.cg(
        A, b, M=DiagonalOperator(dinv), tol=1e-12, maxiter=400
    )
    sol, info = krylov_tpu.cg_stencil(A, b, M="jacobi", tol=1e-12, maxiter=400)
    assert info.success
    assert info.numsteps == info_ref.numsteps
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), atol=1e-10)
    m = min(len(info.resnorms), len(info_ref.resnorms))
    np.testing.assert_allclose(
        info.resnorms[:m], info_ref.resnorms[:m], rtol=1e-9, atol=1e-13
    )
    # rejected combinations
    Ac = stencil.poisson_2d_const(8, 16, dtype=np.float64)
    with pytest.raises(ValueError):
        krylov_tpu.cg_stencil(Ac, b, M="jacobi")
    with pytest.raises(ValueError):
        krylov_tpu.cg_stencil(A, b, M="ilu")


def test_cg_stencil_grid_variable_coefficient_matches_generic_cg():
    """cg_stencil accepts GridStencilOperator (unfused grid branch on CPU;
    the fused var-coef kernel itself is pinned by the interpret-mode test
    above and by tools/tpu_smoke.py on hardware)."""
    rng = np.random.default_rng(24)
    a = 0.5 + rng.random((8, 16))
    A = stencil.diffusion_2d(a, dtype=np.float64)
    b = jnp.asarray(rng.standard_normal(128))
    sol_ref, info_ref = krylov_tpu.cg(A, b, tol=1e-12, maxiter=400)
    sol, info = krylov_tpu.cg_stencil(A, b, tol=1e-12, maxiter=400)
    assert info.success
    assert info.numsteps == info_ref.numsteps
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref), atol=1e-10)
    m = min(len(info.resnorms), len(info_ref.resnorms))
    np.testing.assert_allclose(
        info.resnorms[:m], info_ref.resnorms[:m], rtol=1e-9, atol=1e-13
    )
    # fused=True on CPU routes to the same unfused step (supports() is
    # False off-TPU) — exercised for the grid variant's gating logic
    sol_f, info_f = krylov_tpu.cg_stencil(A, b, tol=1e-12, maxiter=400,
                                          fused=True)
    assert info_f.success and info_f.numsteps == info.numsteps
