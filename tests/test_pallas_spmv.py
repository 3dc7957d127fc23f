"""PET (page-ELL tiles) Pallas CSR SpMV: correctness in interpret mode.

The kernel's compiled path runs on TPU only; these tests drive the same
kernel through the Pallas interpreter on CPU against scipy ground truth
(reference consumes scipy CSR implicitly: tests/test_solvers.py:199-209).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse

import krylov_tpu
from krylov_tpu.ops.pallas_spmv import PETOperator, build_pet, pet_matvec

RNG = np.random.default_rng(42)


def _irregular(n, span, dmax, seed=0):
    rng = np.random.default_rng(seed)
    row_nnz = rng.integers(0, dmax, n)  # includes empty rows
    nnz = int(row_nnz.sum())
    indptr = np.r_[0, np.cumsum(row_nnz)]
    r = np.repeat(np.arange(n), row_nnz)
    c = np.clip(r + rng.integers(-span, span, nnz), 0, n - 1).astype(np.int32)
    d = rng.standard_normal(nnz)
    return scipy.sparse.csr_matrix((d, c, indptr), shape=(n, n))


CASES = {
    "tridiag": scipy.sparse.diags(
        [-1.0, 2.5, -1.0], [-1, 0, 1], shape=(300, 300), format="csr"
    ),
    "rect": scipy.sparse.random(257, 391, density=0.05, random_state=1,
                                format="csr"),
    "irregular": _irregular(1000, 200, 30),
    "wide-span": scipy.sparse.random(500, 70000, density=0.001,
                                     random_state=2, format="csr"),
    "two-band": scipy.sparse.diags(
        [1.0, 2.0, 3.0], [-40000, 0, 40000], shape=(50000, 50000),
        format="csr"
    ),
    "empty": scipy.sparse.csr_matrix((130, 130)),
}


@pytest.mark.parametrize("name", list(CASES))
def test_pet_matvec_matches_scipy(name):
    sp = CASES[name].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    x = RNG.standard_normal(sp.shape[1]).astype(np.float32)
    got = np.asarray(A @ jnp.asarray(x))
    want = sp @ x
    scale = 1 + (np.abs(want).max() if want.size else 0)
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


@pytest.mark.parametrize("name", ["tridiag", "rect", "irregular"])
def test_pet_rmatvec_matches_scipy(name):
    sp = CASES[name].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    x = RNG.standard_normal(sp.shape[0]).astype(np.float32)
    got = np.asarray(A.rmatvec(jnp.asarray(x)))
    want = sp.T.conj() @ x
    scale = 1 + np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_pet_multi_rhs():
    sp = CASES["irregular"].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    X = RNG.standard_normal((sp.shape[1], 3)).astype(np.float32)
    got = np.asarray(A @ jnp.asarray(X))
    want = sp @ X
    np.testing.assert_allclose(got, want, atol=2e-5 * (1 + np.abs(want).max()))


def test_pet_reports_fill_and_diagonal():
    sp = CASES["tridiag"].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    assert 0 < A.fill <= 1
    assert A.nnz == sp.nnz
    np.testing.assert_allclose(np.asarray(A.diagonal()), sp.diagonal())


def test_pet_operator_in_cg_solver():
    """PETOperator plugs into the solver layer as a first-class operator."""
    n = 400
    sp = scipy.sparse.diags(
        [-1.0, 2.8, -1.0], [-1, 0, 1], shape=(n, n), format="csr"
    ).astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    b = jnp.asarray(RNG.standard_normal(n), jnp.float32)
    sol, info = krylov_tpu.cg(A, b, tol=1e-5, maxiter=400)
    assert info.success
    r = np.asarray(b) - sp @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-4 * (1 + np.linalg.norm(np.asarray(b)))


def test_pet_pytree_roundtrip():
    sp = CASES["tridiag"].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)
    leaves, treedef = jax.tree_util.tree_flatten(A)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = RNG.standard_normal(sp.shape[1]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(A2 @ jnp.asarray(x)), np.asarray(A @ jnp.asarray(x))
    )


def test_pet_build_reports_padding_stats():
    pet = build_pet(CASES["irregular"].astype(np.float32))
    dedup = CASES["irregular"].copy()
    dedup.sum_duplicates()
    assert pet["nnz"] == dedup.nnz
    assert pet["nchunks"] >= 1
    # fill = true nnz / streamed slot-lanes
    assert abs(pet["fill"] - pet["nnz"] / (pet["nchunks"] * pet["lc"] * 128)) < 1e-12


def test_pet_bf16_data_stream():
    """bf16 value stream (3 bytes/slot-lane) for mixed-precision use, e.g.
    as the low-precision inner operator of krylov_tpu.refine."""
    sp = scipy.sparse.random(500, 800, density=0.02, random_state=1,
                             format="csr").astype(np.float32)
    A16 = PETOperator.from_scipy(sp, interpret=True, data_dtype=jnp.bfloat16)
    assert A16.dtype == jnp.bfloat16
    x = RNG.standard_normal(800).astype(np.float32)
    y = np.asarray(A16 @ jnp.asarray(x))
    want = sp @ x
    rel = np.max(np.abs(y - want)) / (1 + np.max(np.abs(want)))
    assert rel < 2e-2  # bf16 data rounding


def test_tpu_routing_prefers_pet_for_large_csr(monkeypatch):
    """On a TPU backend, large scattered scipy matrices route to the PET
    kernel instead of the unusable XLA gather path (predicate mocked: this
    suite runs CPU/f64, where the portable path is correct and kept)."""
    from krylov_tpu import _operators

    sp = scipy.sparse.random(2048, 2048, density=0.02, random_state=0,
                             format="csr")
    assert sp.nnz >= (1 << 16)
    assert _operators._pet_eligible_matrix(sp)  # size/realness predicate
    assert not _operators._prefer_pet_for_csr(sp)  # CPU/f64 here
    # fake a TPU f32 backend so the real routing predicate runs end-to-end
    import types

    fake_jax = types.SimpleNamespace(
        Array=jax.Array,  # as_operator's isinstance check still needs it
        default_backend=lambda: "tpu",
        config=types.SimpleNamespace(jax_enable_x64=False),
    )
    monkeypatch.setattr(_operators, "jax", fake_jax)
    assert _operators._prefer_pet_for_csr(sp)
    op = _operators.as_operator(sp)
    assert type(op).__name__ == "PETOperator"


def test_pet_operator_usable_under_jit():
    """The operator's pytree aux must be hashable (dicts would break the
    PyTreeDef and any jit/vmap taking the operator as an argument)."""
    sp = CASES["tridiag"].astype(np.float32)
    A = PETOperator.from_scipy(sp, interpret=True)

    @jax.jit
    def mv(op, v):
        return op @ v

    x = jnp.asarray(RNG.standard_normal(sp.shape[1]).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(mv(A, x)), np.asarray(A @ x), rtol=1e-6
    )


def test_pet_lazy_adjoint_and_complex_guard():
    """Auto-route defers the adjoint PET build to the first rmatvec call,
    and complex scipy matrices never route to the f32-only PET kernel."""
    from krylov_tpu import _operators

    sp = scipy.sparse.random(512, 512, density=0.05, random_state=3,
                             format="csr").astype(np.float32)
    A = PETOperator.from_scipy(sp, with_rmatvec="lazy", interpret=True)
    assert A._pet_t is None
    x = jnp.asarray(RNG.standard_normal(512).astype(np.float32))
    got = np.asarray(A.rmatvec(x))
    assert A._pet_t is not None  # built on first use
    np.testing.assert_allclose(got, sp.T @ np.asarray(x), atol=1e-4)

    spc = (sp + 1j * sp).tocsr()
    spc_big = scipy.sparse.block_diag([spc] * 8).tocsr()
    assert spc_big.nnz >= (1 << 16)
    # even at eligible size, complex data must never be PET-eligible
    assert not _operators._pet_eligible_matrix(spc_big)
    real_big = scipy.sparse.block_diag([sp] * 8).tocsr()
    assert _operators._pet_eligible_matrix(real_big)


def test_native_pet_builder_matches_numpy_bitwise():
    """The C++ PET builder (csrc/pet_build.cpp) must produce BIT-IDENTICAL
    arrays to the numpy path — same stable orderings, same greedy
    scheduler.  Skipped where no toolchain is available."""
    import os

    from krylov_tpu.ops import _native

    for kind, seed in (("band", 0), ("rand", 1), ("wide", 2)):
        rng = np.random.default_rng(seed)
        if kind == "wide":
            # columns > 2^22 puts the page index above 2^15: regression
            # for the lexsort-key bit width in the C++ builder (a 15-bit
            # page field silently merged slots across distant pages)
            n, m = 1 << 15, 5 << 20
            rr = np.repeat(np.arange(n), 3)
            cc = rng.integers(0, m, 3 * n)
        else:
            n = m = 1 << 17
            rr = np.repeat(np.arange(n), 4)
            if kind == "band":
                cc = np.clip(rr + rng.integers(-300, 300, 4 * n), 0, n - 1)
            else:
                cc = rng.integers(0, n, 4 * n)
        sp = scipy.sparse.csr_matrix(
            (rng.standard_normal(len(rr)).astype(np.float32), (rr, cc)),
            shape=(n, m),
        )
        sp.sum_duplicates()

        from krylov_tpu.ops.pallas_spmv import build_pet, choose_cwp

        # build_pet resolves the auto window size OUTSIDE the builders;
        # pass the same choice to both so the parity check is exact
        cwp = choose_cwp(sp)
        host = _native.pet_build_native(sp, cwp=cwp)
        if host is None:
            pytest.skip("native builder unavailable (no compiler?)")

        os.environ["KRYLOV_TPU_NO_NATIVE"] = "1"
        _native._tried, _native._lib = False, None
        try:
            ref = build_pet(sp, cwp=cwp)
        finally:
            del os.environ["KRYLOV_TPU_NO_NATIVE"]
            _native._tried, _native._lib = False, None

        assert host["nchunks"] == ref["nchunks"]
        assert host["lc"] == ref["lc"]
        assert host["fill"] == pytest.approx(ref["fill"], rel=1e-12)
        for k in ("ent", "dat", "meta", "meta_v"):
            np.testing.assert_array_equal(host[k], np.asarray(ref[k]),
                                          err_msg=f"{kind}/{k}")


def test_route_cache_mutation_and_eviction():
    """The as_operator route cache must (a) invalidate on ANY in-place
    value edit — the fingerprint hashes the full buffers, sampling missed
    single-element edits — and (b) self-evict when the scipy matrix is
    garbage collected, so per-time-step matrices don't leak device
    buffers (r3 review findings)."""
    import gc

    from krylov_tpu import _operators

    sp = scipy.sparse.random(
        256, 256, density=0.05, random_state=5, format="csr"
    ).astype(np.float32)

    calls = []

    def build(A):
        calls.append(1)
        return ("op", A.nnz)

    op1 = _operators._route_cached(sp, build)
    op2 = _operators._route_cached(sp, build)
    assert op1 is op2 and len(calls) == 1  # cache hit

    sp.data[1] *= 100.0  # single-element in-place edit
    op3 = _operators._route_cached(sp, build)
    assert len(calls) == 2, "mutated matrix must rebuild"
    assert op3 is not op1

    key = id(sp)
    assert key in _operators._ROUTE_CACHE
    del sp, op1, op2, op3
    gc.collect()
    assert key not in _operators._ROUTE_CACHE, "dead entry must evict"


def test_pet_lazy_adjoint_survives_flatten_without_building():
    """Flattening a with_rmatvec='lazy' operator must NOT build the
    adjoint (CG/GMRES never use it); two-sided solvers materialize it
    host-side via ensure_adjoint() before tracing (solvers/_common.setup),
    and a flattened copy without one raises a targeted error."""
    import jax.tree_util as jtu

    sp = scipy.sparse.random(512, 512, density=0.05, random_state=7,
                             format="csr").astype(np.float32)
    A = PETOperator.from_scipy(sp, with_rmatvec="lazy", interpret=True)

    leaves, treedef = jtu.tree_flatten(A)
    assert A._pet_t is None, "flatten must stay lazy"
    A2 = jtu.tree_unflatten(treedef, leaves)
    x = jnp.asarray(RNG.standard_normal(512).astype(np.float32))
    with pytest.raises(ValueError, match="ensure_adjoint"):
        A2.rmatvec(x)

    # bicg goes through setup(needs_rmatvec=True): adjoint is built before
    # any tracing, so the solve works end-to-end on the lazy operator
    A.ensure_adjoint()
    assert A._pet_t is not None
    leaves, treedef = jtu.tree_flatten(A)
    A3 = jtu.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(
        np.asarray(A3.rmatvec(x)), sp.T @ np.asarray(x), atol=1e-4
    )


def _scrambled_banded(n=20000, seed=11):
    rng = np.random.default_rng(seed)
    row_nnz = rng.integers(3, 12, n)
    nnz = int(row_nnz.sum())
    indptr = np.r_[0, np.cumsum(row_nnz)]
    r = np.repeat(np.arange(n), row_nnz)
    c = np.clip(r + rng.integers(-40, 40, nnz), 0, n - 1)
    sp = scipy.sparse.csr_matrix(
        (rng.standard_normal(nnz).astype(np.float32), (r, c)), shape=(n, n)
    )
    sp.sum_duplicates()
    p = rng.permutation(n)
    return sp[p][:, p].tocsr()


def test_pet_reorder_rcm_correct_and_improves_fill():
    """reorder="rcm" builds the PET of the bandwidth-reduced symmetric
    permutation but keeps user-order matvec/rmatvec semantics; on a
    scrambled banded matrix the fill (inverse of streamed bytes) improves
    severalfold."""
    from krylov_tpu.ops.pallas_spmv import estimate_pet_fill

    sp = _scrambled_banded()
    A0 = PETOperator.from_scipy(sp, interpret=True)
    A1 = PETOperator.from_scipy(
        sp, with_rmatvec=True, interpret=True, reorder="rcm"
    )
    assert A1.fill > 2 * A0.fill, (A0.fill, A1.fill)

    x = RNG.standard_normal(sp.shape[1]).astype(np.float32)
    want = sp @ x
    scale = 1 + np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(A1 @ jnp.asarray(x)), want, atol=2e-5 * scale
    )
    wantT = sp.T @ x
    np.testing.assert_allclose(
        np.asarray(A1.rmatvec(jnp.asarray(x))), wantT,
        atol=2e-5 * (1 + np.abs(wantT).max()),
    )
    X = RNG.standard_normal((sp.shape[1], 3)).astype(np.float32)
    wantM = sp @ X
    np.testing.assert_allclose(
        np.asarray(A1 @ jnp.asarray(X)), wantM,
        atol=2e-5 * (1 + np.abs(wantM).max()),
    )
    # diagonal stays in user order
    np.testing.assert_allclose(np.asarray(A1.diagonal()), sp.diagonal())

    # the permutation survives the pytree boundary
    leaves, treedef = jax.tree_util.tree_flatten(A1)
    A2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(
        np.asarray(A2 @ jnp.asarray(x)),
        np.asarray(A1 @ jnp.asarray(x)),
    )

    # the fill estimator tracks the built fill for routing decisions
    est0 = estimate_pet_fill(sp)
    est1 = estimate_pet_fill(sp, A1._perm is not None and np.asarray(A1._perm))
    assert abs(est0 - A0.fill) / A0.fill < 0.5
    assert est1 > 2 * est0


def test_pet_reorder_auto_and_explicit_perm():
    """"auto" reorders scrambled matrices and leaves well-ordered ones
    alone; an explicit index array is honored."""
    sp_bad = _scrambled_banded(seed=12)
    A_auto = PETOperator.from_scipy(sp_bad, interpret=True, reorder="auto")
    assert A_auto._perm is not None  # scrambled: reorders

    sp_good = CASES["tridiag"].astype(np.float32)
    A_good = PETOperator.from_scipy(sp_good, interpret=True, reorder="auto")
    assert A_good._perm is None  # already ordered: no permutation

    from krylov_tpu.ops.pallas_spmv import rcm_permutation

    perm = rcm_permutation(sp_bad)
    A_explicit = PETOperator.from_scipy(sp_bad, interpret=True, reorder=perm)
    x = RNG.standard_normal(sp_bad.shape[1]).astype(np.float32)
    want = sp_bad @ x
    np.testing.assert_allclose(
        np.asarray(A_explicit @ jnp.asarray(x)), want,
        atol=2e-5 * (1 + np.abs(want).max()),
    )

    # a reordered operator drives a whole solve through the public API
    spd = sp_bad @ sp_bad.T + 20.0 * scipy.sparse.identity(
        sp_bad.shape[0], dtype=np.float32, format="csr"
    )
    Ar = PETOperator.from_scipy(spd.tocsr().astype(np.float32),
                                interpret=True, reorder="rcm")
    b = np.ones(sp_bad.shape[0], np.float32)
    sol, info = krylov_tpu.cg(Ar, jnp.asarray(b), tol=1e-5, maxiter=500)
    assert info.success
    r = b - spd @ np.asarray(sol)
    assert np.linalg.norm(r) <= 1e-3 * (1 + np.linalg.norm(b))


def test_route_cache_evicts_lazy_pet_chain():
    """The cached lazy PETOperator must not strongly hold the user's
    matrix (weak host handle): otherwise the cache's weakref eviction
    never fires and a time-stepping loop leaks one O(nnz) entry per
    matrix (r3 review finding)."""
    import gc

    from krylov_tpu import _operators

    sp = scipy.sparse.random(
        300, 300, density=0.05, random_state=9, format="csr"
    ).astype(np.float32)
    op = _operators._route_cached(
        sp,
        lambda A: PETOperator.from_scipy(A, with_rmatvec="lazy",
                                         interpret=True),
    )
    key = id(sp)
    assert key in _operators._ROUTE_CACHE
    del sp
    gc.collect()
    assert key not in _operators._ROUTE_CACHE, (
        "lazy operator kept the matrix alive through the cache"
    )
    # with the source gone, rmatvec degrades to the targeted error
    x = jnp.asarray(RNG.standard_normal(300).astype(np.float32))
    with pytest.raises(ValueError, match="garbage collection"):
        op.rmatvec(x)


def test_reorder_rejects_rectangular_up_front():
    """resolve_reorder must raise its targeted message before computing
    any permutation on a rectangular matrix (r3 review finding: scipy's
    'inconsistent shapes' leaked out of rcm_permutation instead)."""
    sp = CASES["rect"].astype(np.float32)
    for spec in ("rcm", "auto"):
        with pytest.raises(ValueError, match="square matrix"):
            PETOperator.from_scipy(sp, interpret=True, reorder=spec)


def test_pet_bf16_data_spmm():
    """The bf16 (low-precision) mode through the multi-RHS kernel: one
    unsplit selection pass + one unsplit routing pass per chunk (the
    data_dtype=bfloat16 kernel mode measured by bench.py's
    csr_pet_bf16_* metrics)."""
    sp = scipy.sparse.random(400, 400, density=0.03, random_state=3,
                             format="csr").astype(np.float32)
    A16 = PETOperator.from_scipy(sp, interpret=True,
                                 data_dtype=jnp.bfloat16,
                                 with_rmatvec=False)
    X = RNG.standard_normal((400, 4)).astype(np.float32)
    Y = np.asarray(A16 @ jnp.asarray(X))
    want = sp @ X
    rel = np.max(np.abs(Y - want)) / (1 + np.max(np.abs(want)))
    assert rel < 2e-2
