"""Benchmark sweep: SpMV + CG across operator formats, dims, dtypes, sizes.

Wider evidence than bench.py's single headline: prints one JSON line per
config.  Run on a real chip: ``python tools/bench_sweep.py``.

Configs (per BASELINE.md's 1M-100M-row Poisson family):
  2-D 5-point at 4.2M / 16.8M / 67.1M rows, 3-D 7-point at 16.8M / 134.2M,
  each as {variable-coefficient, constant-coefficient} x {f32, bf16-const},
  plus compiled CG-100 on the largest 2-D and 3-D const systems.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from krylov_tpu.ops import stencil
    from krylov_tpu.solvers.cg import cg

    on_tpu = jax.devices()[0].platform == "tpu"
    kind = getattr(jax.devices()[0], "device_kind", "cpu")

    from krylov_tpu.ops.pallas_stencil import (
        const_stencil2d_matvec,
        stencil2d_matvec,
        supports,
    )

    # The operator/coefficients are ARGUMENTS, never closure constants
    # (closed-over device arrays are baked into the program as literals and
    # overflow the remote-compile tunnel).  Chained applications are dead
    # after each step, so on TPU the kernels reuse the iterate buffer
    # (alias_x) — same methodology as bench.py.
    @partial(jax.jit, static_argnums=(2, 3))
    def chain_var_k(c2, v, offs, K):
        ro, co = offs
        return lax.fori_loop(
            0, K, lambda i, u: stencil2d_matvec(c2, u, ro, co, alias_x=True), v
        )

    @partial(jax.jit, static_argnums=(1, 2))
    def chain_const_k(v, bands, K):
        return lax.fori_loop(
            0, K,
            lambda i, u: const_stencil2d_matvec(u, bands, alias_x=True), v,
        )

    @partial(jax.jit, static_argnums=2)
    def chain(op, v, K):
        return lax.fori_loop(0, K, lambda i, u: op @ u, v)

    def _timed(fn, args, k_lo=8, k_hi=72, reps=3):
        def t(K):
            r = fn(*args, K)
            float(jnp.sum(r.astype(jnp.float32)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = fn(*args, K)
                float(jnp.sum(r.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)

    def _ks(x):
        # small problems run so fast the K-delta drowns in tunnel noise;
        # widen the spread until the measured work is ~100ms+
        n = x.size
        k_hi = 72 if n >= 32 * 1024 * 1024 else 520 if n >= 2**22 else 2056
        return {"k_lo": 8, "k_hi": k_hi}

    def timed_var(op, x):
        if supports(x.dtype, *op.grid, op.row_offsets):
            return _timed(
                chain_var_k,
                (op.coeffs2d, x, (op.row_offsets, op.col_offsets)),
                **_ks(x),
            )
        return _timed(chain, (op, x), **_ks(x))

    def timed_const(op, x):
        ro = tuple(b[0] for b in op.kernel_bands)
        if supports(x.dtype, *op.grid, ro):
            return _timed(chain_const_k, (x, op.kernel_bands), **_ks(x))
        return _timed(chain, (op, x), **_ks(x))

    rng = np.random.default_rng(0)
    scale = np.float32(0.06)  # keep chained iterates stable (3-D too)

    import sys as _sys

    big = "--big" in _sys.argv  # adds the 134M-row config (long runtime)
    configs = []
    if on_tpu:
        configs += [("2d", (2048, 2048)), ("2d", (4096, 4096)),
                    ("2d", (8192, 8192)), ("3d", (256, 256, 256))]
        if big:
            configs += [("3d", (512, 512, 512))]
    else:
        configs += [("2d", (128, 128)), ("3d", (32, 32, 32))]

    for dim, shape in configs:
        N = int(np.prod(shape))
        make_var = stencil.poisson_2d if dim == "2d" else stencil.poisson_3d
        make_const = (
            stencil.poisson_2d_const if dim == "2d" else stencil.poisson_3d_const
        )

        # variable-coefficient (skip the largest: coeff planes > HBM budget)
        ndiag = 5 if dim == "2d" else 7
        if (ndiag + 2) * N * 4 < 10e9:
            Av = make_var(*shape, dtype=np.float32)
            Avs = stencil.GridStencilOperator(
                Av.coeffs2d * scale, Av.offsets, Av.ny, hermitian=True
            )
            x = jnp.asarray(rng.standard_normal(Avs.grid), jnp.float32)
            dt = timed_var(Avs, x)
            print(json.dumps({
                "bench": f"spmv_{dim}_var_f32", "n_rows": N,
                "us": round(dt * 1e6, 1),
                "gbps": round((ndiag + 2) * N * 4 / dt / 1e9, 1),
                "nnz_per_s": round(int(Av.nnz) / dt, 1), "device": kind,
            }))
            del Av, Avs, x

        Ac = make_const(*shape, dtype=np.float32)
        Acs = stencil.ConstStencilOperator(
            shape, Ac.offsets_nd, tuple(scale * w for w in Ac.weights),
            np.float32,
        )
        x = jnp.asarray(rng.standard_normal(Acs.grid), jnp.float32)
        dt = timed_const(Acs, x)
        print(json.dumps({
            "bench": f"spmv_{dim}_const_f32", "n_rows": N,
            "us": round(dt * 1e6, 1),
            "gbps": round(2 * N * 4 / dt / 1e9, 1),
            "nnz_per_s": round(int(Ac.nnz) / dt, 1), "device": kind,
        }))

        Ab = stencil.ConstStencilOperator(
            shape, Ac.offsets_nd, tuple(scale * w for w in Ac.weights),
            jnp.bfloat16,
        )
        dt = timed_const(Ab, x.astype(jnp.bfloat16))
        print(json.dumps({
            "bench": f"spmv_{dim}_const_bf16", "n_rows": N,
            "us": round(dt * 1e6, 1),
            "gbps": round(2 * N * 2 / dt / 1e9, 1),
            "nnz_per_s": round(int(Ac.nnz) / dt, 1), "device": kind,
        }))

        # compiled CG-100
        b = jnp.ones(Ac.grid, jnp.float32)

        @jax.jit
        def solve(b, _A=Ac):
            _, info = cg(_A, b, inner=lambda u, v: jnp.sum(u * v),
                         tol=0.0, atol=0.0, maxiter=100,
                         backend="while_loop")
            return info.resnorms

        r = solve(b)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            r = solve(b)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "bench": f"cg100_{dim}_const_f32", "n_rows": N,
            "ms": round(best * 1e3, 1),
            "us_per_iter": round(best * 1e4, 1), "device": kind,
        }))
        del Ac, Acs, Ab, x, b

    # ---- block-structured multi-RHS: BSR (MXU SpMM) vs CSR (PET kernel)
    if on_tpu:
        import scipy.sparse

        from krylov_tpu.ops.bsr import BSROperator
        from krylov_tpu.ops.pallas_spmv import (
            _pet_matmat_padded,
            _pet_matvec_padded,
            build_pet,
        )

        brng = np.random.default_rng(1)
        R, nb = 128, 128  # 16384 rows, block tridiagonal of 128x128 blocks
        n = R * nb
        rows, cols, blocks = [], [], []
        for i in range(nb):
            for j in (i - 1, i, i + 1):
                if 0 <= j < nb:
                    rows.append(i); cols.append(j)
                    blocks.append(brng.standard_normal((R, R)).astype(np.float32))
        data = np.stack(blocks)
        indptr = np.zeros(nb + 1, np.int64)
        np.add.at(indptr, np.asarray(rows) + 1, 1)
        sp_b = scipy.sparse.bsr_matrix(
            (data, np.asarray(cols), np.cumsum(indptr)), shape=(n, n)
        ).tocsr()
        K_RHS = 8
        X = jnp.asarray(brng.standard_normal((n, K_RHS)), jnp.float32)

        A_bsr = BSROperator.from_scipy(sp_b, blocksize=(R, R))

        @partial(jax.jit, static_argnums=3)
        def chain_bsr(d, c, x2, K, shape=A_bsr.shape):
            op = BSROperator(d, c, shape)
            return lax.fori_loop(0, K, lambda i, u: (op @ u) * 1e-3 + u * 0.5, x2)

        dt_b = _timed(chain_bsr, (A_bsr.data, A_bsr.cols, X), k_lo=8, k_hi=2056)
        nnz = sp_b.nnz
        print(json.dumps({
            "bench": "spmm_bsr_multirhs8_f32", "n_rows": n,
            "us": round(dt_b * 1e6, 1),
            "nnz_per_s": round(nnz / dt_b, 1),
            "rhs_nnz_per_s": round(nnz * K_RHS / dt_b, 1), "device": kind,
        }))

        def pet_rhs_chains(pet, n):
            """(SpMM-kernel chain, per-column chain) for one PET matrix."""
            npad = pet["pages_pad"] * 128
            geom = dict(
                nchunks=pet["nchunks"], ngroups=pet["ngroups"],
                pages_pad=pet["pages_pad"], lc=pet["lc"], interpret=False,
            )

            @partial(jax.jit, static_argnums=5)
            def chain_spmm(ent, dat, meta, meta_v, xw, K):
                # xw: column-in-lane-major (pages_pad, K_RHS*128); the
                # kernel output shares the layout, so feedback is a
                # row slice/pad
                def body(i, u):
                    y = _pet_matmat_padded(
                        ent, dat, meta, meta_v, u, k=K_RHS, **geom
                    )
                    rows = u.shape[0]
                    y = (
                        y[:rows]
                        if y.shape[0] >= rows
                        else jnp.pad(y, ((0, rows - y.shape[0]), (0, 0)))
                    )
                    return y * 1e-3 + u * 0.5

                return lax.fori_loop(0, K, body, xw)

            @partial(jax.jit, static_argnums=5)
            def chain_percol(ent, dat, meta, meta_v, x2, K):
                def one(v):
                    y = _pet_matvec_padded(
                        ent, dat, meta, meta_v,
                        v.reshape(pet["pages_pad"], 128), **geom
                    ).reshape(-1)
                    return jnp.pad(y[:n], (0, npad - n))

                def body(i, u):
                    y = jax.vmap(one, in_axes=1, out_axes=1)(u)
                    return y * 1e-3 + u * 0.5

                return lax.fori_loop(0, K, body, x2)

            return chain_spmm, chain_percol

        def bench_pet_rhs(tag, sp_mat, X, dt_ref=None):
            pet = build_pet(sp_mat)
            nloc = sp_mat.shape[0]
            chain_spmm, chain_percol = pet_rhs_chains(pet, nloc)
            args = (pet["ent"], pet["dat"], pet["meta"], pet["meta_v"])
            Xp = jnp.pad(X, ((0, pet["pages_pad"] * 128 - nloc), (0, 0)))
            Xw = (
                Xp.reshape(pet["pages_pad"], 128, K_RHS)
                .transpose(0, 2, 1)
                .reshape(pet["pages_pad"], K_RHS * 128)
            )
            dt_s = _timed(chain_spmm, args + (Xw,), k_lo=8, k_hi=72)
            dt_c = _timed(chain_percol, args + (Xp,), k_lo=8, k_hi=72)
            nz = sp_mat.nnz
            rec = {
                "bench": tag, "n_rows": nloc,
                "us": round(dt_s * 1e6, 1),
                "percol_us": round(dt_c * 1e6, 1),
                "nnz_per_s": round(nz / dt_s, 1),
                "rhs_nnz_per_s": round(nz * K_RHS / dt_s, 1),
                "spmm_vs_percol": round(dt_c / dt_s, 2),
                "fill": round(pet["fill"], 3), "device": kind,
            }
            if dt_ref is not None:
                rec["bsr_speedup"] = round(dt_s / dt_ref, 2)
            print(json.dumps(rec))

        bench_pet_rhs("spmm_csrpet_multirhs8_f32", sp_b, X, dt_ref=dt_b)

        # irregular general sparsity (no block structure): the case the
        # PET format exists for; VERDICT r2 target is spmm_vs_percol >= 3
        irng = np.random.default_rng(5)
        n_irr = 1 << 20
        rr = np.repeat(np.arange(n_irr), 8)
        cc = np.clip(rr + irng.integers(-2048, 2048, size=rr.size),
                     0, n_irr - 1)
        sp_irr = scipy.sparse.csr_matrix(
            (irng.standard_normal(rr.size).astype(np.float32), (rr, cc)),
            shape=(n_irr, n_irr),
        )
        sp_irr.sum_duplicates()
        X_irr = jnp.asarray(
            irng.standard_normal((n_irr, K_RHS)), jnp.float32
        )
        bench_pet_rhs("spmm_csrpet_irregular_multirhs8_f32", sp_irr, X_irr)

        # symmetric-RCM reorder (reorder="rcm"/"auto" on PETOperator /
        # partition_pet): a scrambled 2-D Poisson streams ~100x fewer
        # slot-bytes after reordering; the kernel is stream-bound so SpMV
        # time should track the fill ratio
        from krylov_tpu.ops.pallas_spmv import rcm_permutation

        prng = np.random.default_rng(9)
        # modest size: the SCRAMBLED side's fill is ~0.01, so its PET
        # arrays are ~100x nnz — at 65k rows that is ~1 GB of HBM, the
        # price of demonstrating the ordering pathology on-device
        npg = 1 << 8
        n_p = npg * npg
        lap_p = scipy.sparse.diags(
            [-1.0, -1.0, 4.5, -1.0, -1.0], [-npg, -1, 0, 1, npg],
            shape=(n_p, n_p), format="csr", dtype=np.float32,
        )
        pscr = prng.permutation(n_p)
        sp_scr = lap_p[pscr][:, pscr].tocsr()
        perm_r = rcm_permutation(sp_scr)
        sp_rcm = sp_scr[perm_r][:, perm_r].tocsr()

        def time_pet_mv(sp_mat):
            pet = build_pet(sp_mat)
            geom = dict(nchunks=pet["nchunks"], ngroups=pet["ngroups"],
                        pages_pad=pet["pages_pad"], lc=pet["lc"],
                        cwp=pet.get("cwp", 32), interpret=False)
            npad = pet["pages_pad"] * 128
            xw = jnp.asarray(
                prng.standard_normal(npad), jnp.float32
            ).reshape(pet["pages_pad"], 128)

            @partial(jax.jit, static_argnums=5)
            def chain(ent, dat, meta, meta_v, x2, K):
                def body(i, xc):
                    y = _pet_matvec_padded(ent, dat, meta, meta_v, xc,
                                           **geom)
                    yf = y.reshape(-1)[:npad] * 1e-4
                    return yf.reshape(x2.shape) + xc * 0.5

                return lax.fori_loop(0, K, body, x2)

            dt = _timed(
                chain,
                (pet["ent"], pet["dat"], pet["meta"], pet["meta_v"], xw),
                k_lo=2, k_hi=18,
            )
            return pet, dt

        pet_scr, dt_scr = time_pet_mv(sp_scr)
        pet_rcm, dt_rcm = time_pet_mv(sp_rcm)
        print(json.dumps({
            "metric": "spmv_csrpet_rcm_reorder_speedup",
            "value": round(dt_scr / dt_rcm, 2), "unit": "x",
            "scrambled_us": round(dt_scr * 1e6, 2),
            "rcm_us": round(dt_rcm * 1e6, 2),
            "fill_scrambled": round(pet_scr["fill"], 4),
            "fill_rcm": round(pet_rcm["fill"], 4),
            "n_rows": n_p, "nnz": int(sp_scr.nnz), "device": kind,
        }))
        del pet_scr, pet_rcm, sp_scr, sp_rcm, lap_p

    # ---- BASELINE config 5 (single-chip compute side): Chebyshev +
    # stationary smoothers on a 100M-row 3-D 7-point Laplacian.  The
    # row-partitioned multi-host execution of the same solvers is
    # exercised on the virtual mesh (test_parallel.py, WEAKSCALE.json);
    # this measures the per-chip iteration cost at the config's scale.
    if on_tpu:
        import krylov_tpu

        g5 = (512, 512, 384)  # 100.7M rows
        N5 = g5[0] * g5[1] * g5[2]
        A5c = stencil.poisson_3d_const(*g5, dtype=np.float32)
        b5 = jnp.ones(A5c.grid, jnp.float32)
        inner5 = lambda u, v: jnp.sum(u * v)  # noqa: E731

        def time_iters(tag, make_run, iters, reps=2):
            run = make_run(iters)
            r = run()
            float(jnp.sum(r))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = run()
                float(jnp.sum(r))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "bench": tag, "n_rows": N5, "iters": iters,
                "ms_per_iter": round(best / iters * 1e3, 3),
                "rhs_rows_per_s": round(N5 * iters / best, 1),
                "device": kind,
            }))

        def mk_cheb(iters):
            @jax.jit
            def run(b=b5):
                _, info = krylov_tpu.chebyshev(
                    A5c, b, inner=inner5,
                    eigenvalue_estimates=(0.05, 12.05),
                    tol=0.0, atol=0.0, maxiter=iters,
                    backend="while_loop",
                )
                return info.resnorms
            return lambda: run()

        def mk_jacobi(iters):
            @jax.jit
            def run(b=b5):
                _, info = krylov_tpu.jacobi(
                    A5c, b, inner=inner5, tol=0.0, atol=0.0,
                    maxiter=iters, backend="while_loop",
                )
                return info.resnorms
            return lambda: run()

        time_iters("chebyshev_3d_100m_f32", mk_cheb, 25)
        time_iters("jacobi_3d_100m_f32", mk_jacobi, 25)

        # Gauss-Seidel needs the variable-coefficient grid form (its
        # triangular scan sweeps read per-row coefficients), passed as a
        # jit argument (closure constants would overflow the
        # remote-compile tunnel).  Measured at 16.8M rows: the 100M-row
        # sweep program exceeds the remote AOT compile helper's limits,
        # and the sweep's cost is dominated by the lax.scan over grid
        # rows anyway (~linear in nx), so the 16.8M point plus the
        # scaling law is the honest evidence.
        g5g = (256, 256, 256)
        A5v = stencil.poisson_3d(*g5g, dtype=np.float32)
        offs5, ny5 = A5v.offsets, A5v.ny
        N5g = g5g[0] * g5g[1] * g5g[2]
        b5f = jnp.ones(N5g, jnp.float32)

        def mk_gs(iters):
            @jax.jit
            def run(c2, b):
                Aop = stencil.GridStencilOperator(
                    c2, offs5, ny5, hermitian=True
                )
                _, info = krylov_tpu.gauss_seidel(
                    Aop, b, tol=0.0, atol=0.0, maxiter=iters,
                    backend="while_loop",
                )
                return info.resnorms
            return lambda: run(A5v.coeffs2d, b5f)

        def time_iters_n(tag, make_run, iters, n_rows, reps=2):
            run = make_run(iters)
            r = run()
            float(jnp.sum(r))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = run()
                float(jnp.sum(r))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({
                "bench": tag, "n_rows": n_rows, "iters": iters,
                "ms_per_iter": round(best / iters * 1e3, 3),
                "device": kind,
            }))

        time_iters_n("gauss_seidel_3d_16m_f32", mk_gs, 4, N5g)

    # ---- AMG: setup time NEXT TO solve time across sizes (round-3
    # verdict item 2: setup was 61 s at 1M rows and tracked nowhere).
    if on_tpu:
        import scipy.sparse

        from krylov_tpu import AMGPreconditioner
        from krylov_tpu import cg as cg_generic
        from krylov_tpu.ops.pallas_spmv import PETOperator

        rng_a = np.random.default_rng(5)
        for npg_a in (512, 1024, 2048):
            Na = npg_a * npg_a
            lap_a = scipy.sparse.diags(
                [-1.0, -1.0, 4.0, -1.0, -1.0],
                [-npg_a, -1, 0, 1, npg_a],
                shape=(Na, Na), format="csr", dtype=np.float32,
            )
            # operator first, reused as the cycle's fine level (what a
            # real user pays: the solve needs the operator regardless)
            t0 = time.perf_counter()
            Aa = PETOperator.from_scipy(lap_a, with_rmatvec=False)
            op_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            Ma = AMGPreconditioner.from_scipy(
                lap_a, dtype=np.float32, fine_operator=Aa
            )
            setup_s = time.perf_counter() - t0
            ba = jnp.asarray(
                rng_a.standard_normal(Na), jnp.float32
            )

            @partial(jax.jit, static_argnames=("mi",))
            def run_amg(op, Mop, bv, mi=60):
                _, info = cg_generic(
                    op, bv, M=Mop, tol=1e-4, maxiter=mi,
                    backend="while_loop",
                )
                return info.resnorms, jnp.asarray(info.numsteps)

            buf_a, k_a = run_amg(Aa, Ma, ba)
            float(jnp.sum(buf_a))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                buf_a, k_a = run_amg(Aa, Ma, ba)
                float(jnp.sum(buf_a))
                best = min(best, time.perf_counter() - t0)
            ka = int(k_a)
            ba_h = np.asarray(buf_a)
            print(json.dumps({
                "bench": "amg_cg_poisson2d_f32", "n_rows": Na,
                "amg_setup_s": round(setup_s, 2),
                "fine_op_build_s": round(op_s, 2),
                "solve_ms": round(best * 1e3, 2), "iters": ka,
                "converged": bool(ba_h[ka] <= 1e-4 * ba_h[0] + 1e-15),
                "levels": list(Ma.level_sizes), "device": kind,
            }))
            del Ma, Aa, lap_a


if __name__ == "__main__":
    main()
