"""Headline benchmark: 2-D Poisson (5-point) stencil SpMV, one chip.

The SpMV is the hot inner op of every Krylov solver (SURVEY.md §3: one SpMV
+ 1-2 reductions per CG iteration) and is HBM-bandwidth-bound; the metric is
achieved HBM bandwidth against the chip's roofline, with ``vs_baseline`` =
achieved / (0.8 * peak) per BASELINE.md's >=80%-of-roofline target.

Accounting: at the headline size (4096^2, 16.7M rows) the x/y ping-pong pair
(134 MB) fits in v5e's VMEM, so the HBM traffic of one matvec is the
coefficient stream alone (5N words); the iterate buffers are reused in place
(``input_output_aliases`` — a fresh-output pallas_call halves the HBM rate).
A pure-streaming configuration (8192^2, 268 MB iterates, 7N-word model) is
reported alongside so both regimes are visible.

Timing: through the remote-TPU tunnel ``block_until_ready`` can return
before device completion and a host roundtrip costs ~100ms, so each
measurement chains K matvecs inside one compiled ``lax.fori_loop`` (K a
traced trip count — one compile serves every K), forces completion with a
scalar readback, and fits a least-squares slope of total time over >=4
values of K; the intercept absorbs all fixed dispatch/readback overhead.
The fit is guarded: a non-positive slope or a loose fit retries, then
raises — the bench refuses to emit a non-physical number (round-4 shipped
``csr_pet_rcm_speedup: -65`` from an unguarded two-point difference).

Prints ONE JSON line:
  {"metric": "spmv_poisson2d_hbm_bandwidth", "value": <GB/s>, "unit":
   "GB/s", "vs_baseline": <value / (0.8 * peak)>, ...extras}
"""

import json
import time
from functools import partial

import numpy as np

# HBM peak bandwidth per chip (GB/s), by jax device_kind
_PEAK_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v5": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "TPU7x": 7400.0,
}


def _peak_gbps(kind: str) -> float:
    if kind in _PEAK_GBPS:
        return _PEAK_GBPS[kind]
    for k, v in sorted(_PEAK_GBPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return 819.0  # conservative fallback


def _probe_backend(timeout_s: float = 180.0) -> bool:
    """True if jax can initialize its default backend within ``timeout_s``.

    Probed in a subprocess because an unreachable remote-TPU (axon) tunnel
    makes ``jax.devices()`` block for ~25 minutes before raising; the bench
    must degrade to CPU in bounded time instead of stalling the round.
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return False  # explicitly pinned to CPU; skip straight to it
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _probe_backend():
        # remote-TPU tunnel unavailable: still produce a JSON line on the
        # host CPU rather than failing the whole bench run.  Must go
        # through jax.config (the environment's sitecustomize force-sets
        # jax_platforms at startup, which overrides JAX_PLATFORMS).
        jax.config.update("jax_platforms", "cpu")

    try:
        dev = jax.devices()[0]
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")
        dev = jax.devices()[0]

    import jax.numpy as jnp
    from jax import lax

    from krylov_tpu.ops import stencil
    from krylov_tpu.ops.pallas_stencil import (
        const_stencil2d_matvec,
        stencil2d_matvec,
    )
    from krylov_tpu.solvers.cg_stencil import cg_stencil

    kind = getattr(dev, "device_kind", "cpu")
    on_tpu = dev.platform == "tpu"
    peak = _peak_gbps(kind) if on_tpu else 50.0  # rough CPU fallback
    rng = np.random.default_rng(0)

    # chained matvec u <- A u; u is dead after each application, so the
    # kernel may reuse its buffer (alias_x).  K is a traced trip count:
    # one compile serves every chain length the slope fit samples.
    @partial(jax.jit, static_argnums=(2, 3))
    def chain_var(c2, v, ro, co, K):
        body = lambda i, u: stencil2d_matvec(c2, u, ro, co, alias_x=True)
        return lax.fori_loop(0, K, body, v)

    def timed(fn, args, k_lo, k_hi, reps, _retries=2):
        """Per-iteration time: least-squares slope of total time over >=4
        chain lengths K in [k_lo, k_hi].  min-of-reps per point rejects
        scheduling noise; the intercept absorbs dispatch/readback
        overhead.  Refuses to return a non-physical estimate: the slope
        must be positive and the fit tight (rms residual <= 25% of the
        K-span of measured times), else the whole sweep repeats; after
        ``_retries`` it raises rather than emit garbage."""
        ks = np.unique(
            np.round(np.linspace(k_lo, k_hi, 4)).astype(np.int64)
        )

        def t(K):
            r = fn(*args, int(K))
            float(jnp.sum(r))  # readback forces completion
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = fn(*args, int(K))
                float(jnp.sum(r))
                best = min(best, time.perf_counter() - t0)
            return best

        t(ks[-1])  # one warmup at the longest chain (compile + caches)
        last = None
        for _ in range(_retries + 1):
            ts = np.array([t(K) for K in ks], dtype=float)
            kk = ks.astype(float)
            slope, icept = np.polyfit(kk, ts, 1)
            pred = slope * kk + icept
            span = float(ts.max() - ts.min())
            rms = float(np.sqrt(np.mean((ts - pred) ** 2)))
            last = (slope, rms, span, ts)
            if slope > 0 and span > 0 and rms <= 0.25 * span:
                return float(slope)
        raise RuntimeError(
            f"timed(): no stable positive slope after {_retries + 1} "
            f"sweeps (slope={last[0]:.3e}s, rms={last[1]:.3e}, "
            f"span={last[2]:.3e}, times={last[3].tolist()}, "
            f"ks={ks.tolist()})"
        )

    k_lo, k_hi, reps = (8, 136, 4) if on_tpu else (2, 10, 2)

    def measure_var(nx):
        A = stencil.poisson_2d(nx, nx, dtype=np.float32)
        c2 = A.coeffs2d * np.float32(0.124)  # stable chaining
        x = jnp.asarray(rng.standard_normal(A.grid), jnp.float32)
        if on_tpu:
            dt = timed(
                chain_var, (c2, x, A.row_offsets, A.col_offsets),
                k_lo, k_hi, reps,
            )
        else:
            op = stencil.GridStencilOperator(c2, A.offsets, A.ny, hermitian=True)

            @jax.jit
            def chain_cpu(v, K):
                return lax.fori_loop(0, K, lambda i, u: op._apply_grid(u), v)

            dt = timed(lambda v, K: chain_cpu(v, K), (x,), k_lo, k_hi, reps)
        return A, dt

    # headline: 16.7M rows — x/y ping-pong resident in VMEM, HBM traffic is
    # the 5N-word coefficient stream
    nx = 4096 if on_tpu else 256
    A, dt = measure_var(nx)
    N = nx * nx
    ndiag = 5
    hbm_bytes = ndiag * N * 4 if on_tpu else (ndiag + 2) * N * 4
    gbps = hbm_bytes / dt / 1e9
    nnz = int(A.nnz)

    extras = {}
    if on_tpu:
        # pure-streaming regime: 268 MB iterates cannot stay in VMEM
        A8, dt8 = measure_var(8192)
        extras["stream_spmv_us"] = round(dt8 * 1e6, 2)
        extras["stream_gbps_7w"] = round(7 * 8192 * 8192 * 4 / dt8 / 1e9, 2)

        # constant-coefficient stencil (x+y only; in-kernel Dirichlet masks)
        Ac = stencil.poisson_2d_const(nx, nx, dtype=np.float32)
        kb = tuple(
            (dr, dc, 0.124 * w, rc) for dr, dc, w, rc in Ac.kernel_bands
        )
        x = jnp.asarray(rng.standard_normal(Ac.grid), jnp.float32)

        @partial(jax.jit, static_argnums=(1,))
        def chain_const(v, bands, K):
            return lax.fori_loop(
                0, K,
                lambda i, u: const_stencil2d_matvec(u, bands, alias_x=True),
                v,
            )

        dtc = timed(lambda v, K: chain_const(v, kb, K), (x,), k_lo, k_hi, reps)
        extras["const_spmv_us"] = round(dtc * 1e6, 2)
        extras["const_nnz_per_s"] = round(int(Ac.nnz) / dtc, 1)

        x16 = x.astype(jnp.bfloat16)
        dtb = timed(lambda v, K: chain_const(v, kb, K), (x16,), k_lo, k_hi, reps)
        extras["bf16_const_spmv_us"] = round(dtb * 1e6, 2)
        extras["bf16_const_nnz_per_s"] = round(int(Ac.nnz) / dtb, 1)

        # general-sparsity CSR via the Pallas PET kernel, vs the portable
        # XLA gather+segment_sum path, on an irregular matrix (variable row
        # degrees 5..50, columns scattered in a 1024-wide band -- no banded/
        # stencil structure is exploited)
        from krylov_tpu.ops.pallas_spmv import build_pet, _pet_matvec_padded

        ncsr = 1 << 20
        crng = np.random.default_rng(7)
        row_nnz = crng.integers(5, 50, ncsr)
        cnnz = int(row_nnz.sum())
        indptr = np.zeros(ncsr + 1, np.int64)
        indptr[1:] = np.cumsum(row_nnz)
        rr = np.repeat(np.arange(ncsr), row_nnz)
        cc = np.clip(rr + crng.integers(-512, 512, cnnz), 0, ncsr - 1)
        import scipy.sparse

        sp_csr = scipy.sparse.csr_matrix(
            (crng.standard_normal(cnnz).astype(np.float32),
             cc.astype(np.int32), indptr),
            shape=(ncsr, ncsr),
        )
        pet = build_pet(sp_csr)

        def time_pet_mv(petx, k_lo=2, k_hi=18):
            # chained-matvec timer shared by the irregular and the
            # RCM-reorder measurements below (the small RCM matrices pass
            # a wider K range: their ~us per-iteration times need longer
            # chains to rise above tunnel noise)
            geom = dict(nchunks=petx["nchunks"], ngroups=petx["ngroups"],
                        pages_pad=petx["pages_pad"], lc=petx["lc"],
                        cwp=petx.get("cwp", 32), interpret=False)
            npad = petx["pages_pad"] * 128
            xw2 = jnp.asarray(
                rng.standard_normal(npad), jnp.float32
            ).reshape(petx["pages_pad"], 128)

            @jax.jit
            def chainx(ent, dat, meta, meta_v, x2, K):
                def body(i, xc):
                    y = _pet_matvec_padded(
                        ent, dat, meta, meta_v, xc, **geom
                    )
                    yf = y.reshape(-1)[:npad] * 1e-4
                    return yf.reshape(x2.shape) + xc * 0.5

                return lax.fori_loop(0, K, body, x2)

            return timed(
                chainx,
                (petx["ent"], petx["dat"], petx["meta"], petx["meta_v"],
                 xw2),
                k_lo, k_hi, 3,
            )

        dtp = time_pet_mv(pet)
        pet_nnz = pet["nnz"]
        slot_bytes = pet["nchunks"] * 128 * pet["lc"] * 5  # int8 lcol + f32 data
        extras["csr_pet_spmv_us"] = round(dtp * 1e6, 2)
        extras["csr_pet_nnz_per_s"] = round(pet_nnz / dtp, 1)
        extras["csr_pet_fill"] = round(pet["fill"], 4)
        extras["csr_pet_cwp"] = pet.get("cwp", 32)
        extras["csr_pet_stream_gbps"] = round(slot_bytes / dtp / 1e9, 2)

        # bf16 value stream (3 bytes/slot-lane vs 5): the low-precision
        # kernel mode — bf16 operator data collapses BOTH exact-selection
        # matmuls (page table + output routing) from 3-way Dekker stacks
        # to ONE unsplit bf16 pass each (design.md's stacked-selection
        # ladder endpoint; pairs with solvers.refine for f32-accurate
        # answers at bf16 streaming cost)
        pet16 = build_pet(sp_csr, data_dtype=jnp.bfloat16)
        dtp16 = time_pet_mv(pet16)
        slot16 = pet16["nchunks"] * 128 * pet16["lc"] * 3
        extras["csr_pet_bf16_spmv_us"] = round(dtp16 * 1e6, 2)
        extras["csr_pet_bf16_nnz_per_s"] = round(pet_nnz / dtp16, 1)
        extras["csr_pet_bf16_stream_gbps"] = round(slot16 / dtp16 / 1e9, 2)
        extras["csr_pet_bf16_speedup"] = round(dtp / dtp16, 2)
        del pet16

        # multi-RHS (SpMM) through the same PET: the index/metadata stream
        # is amortized over k=8 columns (column-in-lane-major x layout, one
        # wide MXU contraction shared by all columns)
        from krylov_tpu.ops.pallas_spmv import _pet_matmat_padded

        K_RHS = 8
        Xw = jnp.asarray(
            rng.standard_normal((pet["pages_pad"], K_RHS * 128)), jnp.float32
        )

        @jax.jit
        def chain_pet_spmm(ent, dat, meta, meta_v, xw, K):
            def body(i, u):
                y = _pet_matmat_padded(
                    ent, dat, meta, meta_v, u, k=K_RHS,
                    nchunks=pet["nchunks"], ngroups=pet["ngroups"],
                    pages_pad=pet["pages_pad"], lc=pet["lc"],
                    interpret=False,
                )
                rows = u.shape[0]
                y = (
                    y[:rows]
                    if y.shape[0] >= rows
                    else jnp.pad(y, ((0, rows - y.shape[0]), (0, 0)))
                )
                return y * 1e-4 + u * 0.5

            return lax.fori_loop(0, K, body, xw)

        dts = timed(
            chain_pet_spmm,
            (pet["ent"], pet["dat"], pet["meta"], pet["meta_v"], Xw),
            2, 18, 3,
        )
        extras["csr_pet_spmm_k8_us"] = round(dts * 1e6, 2)
        extras["csr_pet_spmm_rhs_nnz_per_s"] = round(pet_nnz * K_RHS / dts, 1)
        # vs running the measured single-RHS kernel k times (the per-column
        # fallback the SpMM kernel replaces).  The measured bound for this
        # matrix is ~2.5 (docs/design.md SpMM ladder): the per-column
        # residual is one padded MXU selection pass + the hardware
        # lane-gather + output routing, each already a single hardware op.
        extras["csr_pet_spmm_amortization"] = round(K_RHS * dtp / dts, 2)

        # operator-level column blocks are 16 wide (PET_SPMM_MAX_COLS):
        # report the amortization the solvers actually see
        K16 = 16
        Xw16 = jnp.asarray(
            rng.standard_normal((pet["pages_pad"], K16 * 128)), jnp.float32
        )

        @jax.jit
        def chain_pet_spmm16(ent, dat, meta, meta_v, xw, K):
            def body(i, u):
                y = _pet_matmat_padded(
                    ent, dat, meta, meta_v, u, k=K16,
                    nchunks=pet["nchunks"], ngroups=pet["ngroups"],
                    pages_pad=pet["pages_pad"], lc=pet["lc"],
                    cwp=pet.get("cwp", 32), interpret=False,
                )
                rows = u.shape[0]
                y = (
                    y[:rows]
                    if y.shape[0] >= rows
                    else jnp.pad(y, ((0, rows - y.shape[0]), (0, 0)))
                )
                return y * 1e-4 + u * 0.5

            return lax.fori_loop(0, K, body, xw)

        dts16 = timed(
            chain_pet_spmm16,
            (pet["ent"], pet["dat"], pet["meta"], pet["meta_v"], Xw16),
            2, 18, 3,
        )
        extras["csr_pet_spmm_k16_us"] = round(dts16 * 1e6, 2)
        extras["csr_pet_spmm_k16_amortization"] = round(
            K16 * dtp / dts16, 2
        )

        # symmetric-RCM reorder (PETOperator reorder="rcm"/"auto",
        # auto-routed): a scrambled 2-D Poisson's fill collapses to ~0.01
        # (each entry needs its own slot-lane row), RCM restores column
        # locality; the kernel is stream-bound so time tracks fill.
        # Scrambled side kept small — its PET arrays are ~100x nnz.
        from krylov_tpu.ops.pallas_spmv import rcm_permutation

        npr = 256
        Nr = npr * npr
        lap_r = scipy.sparse.diags(
            [-1.0, -1.0, 4.5, -1.0, -1.0], [-npr, -1, 0, 1, npr],
            shape=(Nr, Nr), format="csr", dtype=np.float32,
        )
        prr = np.random.default_rng(11).permutation(Nr)
        sp_scr = lap_r[prr][:, prr].tocsr()
        perm_rcm = rcm_permutation(sp_scr)
        sp_rcm = sp_scr[perm_rcm][:, perm_rcm].tocsr()

        pet_s = build_pet(sp_scr)
        pet_r = build_pet(sp_rcm)
        # scrambled: ~115 MB of slots per pass (~140 us/iter); RCM: ~4 MB
        # (~5 us/iter) — chain lengths sized so the top point is ~10 ms,
        # well above tunnel jitter, on both sides
        fill_s, dt_s = pet_s["fill"], time_pet_mv(pet_s, 8, 64)
        fill_r, dt_r = pet_r["fill"], time_pet_mv(pet_r, 64, 1024)
        del pet_s, pet_r
        extras["csr_pet_rcm_speedup"] = round(dt_s / dt_r, 2)
        extras["csr_pet_rcm_fill"] = round(fill_r, 4)
        extras["csr_pet_scrambled_fill"] = round(fill_s, 4)
        del sp_scr, sp_rcm, lap_r

        # XLA baseline on the same matrix (gather + segment_sum)
        from krylov_tpu.ops.sparse import CSROperator

        Ax = CSROperator.from_scipy(sp_csr)
        xv = jnp.asarray(rng.standard_normal(ncsr), jnp.float32)

        @jax.jit
        def xla_mv(d, c, r, v):
            op = CSROperator(d, c, r, (ncsr, ncsr))
            return op @ v

        r0 = xla_mv(Ax.data, Ax.indices, Ax.indptr, xv)
        float(jnp.sum(r0))
        t0 = time.perf_counter()
        r0 = xla_mv(Ax.data, Ax.indices, Ax.indptr, xv)
        float(jnp.sum(r0))
        dtx = time.perf_counter() - t0
        extras["csr_xla_nnz_per_s"] = round(pet_nnz / dtx, 1)
        extras["csr_pet_speedup_vs_xla"] = round(dtx / dtp, 1)

        # compiled fused CG, 100 iterations (const-stencil operator)
        b = jnp.ones(Ac.grid, jnp.float32)

        @jax.jit
        def solve(b):
            _, info = cg_stencil(
                Ac, b, tol=0.0, atol=0.0, maxiter=100, fused=True
            )
            return info.resnorms

        r = solve(b)
        float(jnp.sum(r))
        cg_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = solve(b)
            float(jnp.sum(r))
            cg_s = min(cg_s, time.perf_counter() - t0)
        extras["cg100_ms"] = round(cg_s * 1e3, 2)

        # fused VARIABLE-coefficient CG: phase A streams the 5-plane
        # coefficient stack and folds the p-update, stencil and pAp
        # partial into one pass (~15N vs ~19N words/iter unfused).
        # Timed as a SLOPE over maxiter: a single solve call carries a
        # ~100-150 ms host-dispatch/readback constant through the remote
        # tunnel, identical for both variants — round 4's 0.91 "fused
        # slowdown" was that constant compressing the ratio of two
        # best-of-3 totals plus noise.  The marginal per-iteration cost
        # is the honest quantity (and what time-to-tolerance at scale is
        # made of); the fixed-cost totals at maxiter=100 are still
        # reported for continuity.
        #
        # Two mechanics matter for honest numbers:
        #   * A enters as a pytree ARGUMENT (closing over it would embed
        #     the 335 MB coefficient stack as an HLO constant — too large
        #     for the remote-compile tunnel, and a bad program anyway),
        #     and is device_put ONCE: numpy leaves would otherwise
        #     re-upload 335 MB host->device on every call (~1.4 s/call
        #     through the tunnel, swamping the totals).
        #   * the jitted wrapper is defined ONCE at this scope, so jax's
        #     trace cache is reused across the slope sweep instead of
        #     re-tracing/lowering per call.
        A_dev = jax.device_put(A)
        jax.block_until_ready(A_dev.coeffs2d)

        @partial(jax.jit, static_argnums=(2, 3))
        def solve_var(A__, b__, fused_, mi_):
            _, info = cg_stencil(
                A__, b__, tol=0.0, atol=0.0, maxiter=mi_, fused=fused_
            )
            return info.resnorms

        var_f_iter = timed(
            lambda b_, K: solve_var(A_dev, b_, True, int(K)), (b,), 40, 280, 3
        )
        var_u_iter = timed(
            lambda b_, K: solve_var(A_dev, b_, False, int(K)), (b,), 40, 280, 3
        )
        extras["cg_var_fused_iter_us"] = round(var_f_iter * 1e6, 2)
        extras["cg_var_unfused_iter_us"] = round(var_u_iter * 1e6, 2)
        extras["cg100_var_fused_speedup"] = round(var_u_iter / var_f_iter, 2)

        def total_var(fused):
            r = solve_var(A_dev, b, fused, 100)
            float(jnp.sum(r))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                r = solve_var(A_dev, b, fused, 100)
                float(jnp.sum(r))
                best = min(best, time.perf_counter() - t0)
            return best

        extras["cg100_var_ms"] = round(total_var(True) * 1e3, 2)
        extras["cg100_var_unfused_ms"] = round(total_var(False) * 1e3, 2)

        # multigrid-preconditioned CG, time-to-tolerance at the headline
        # size (16.7M rows), manufactured solution b = A x*.  Two points
        # make this an honest f32 benchmark:
        #   * criterion: tol 1e-6 RELATIVE explicit residual.  The f32
        #     attainable floor is ~eps*(||A|| ||x*|| + ||b||)/||b||; with
        #     b = A x* and x* ~ N(0,1) that is ~1e-6..1e-5 margin below
        #     nothing, whereas b = ones drives ||x||/||b|| ~ 1/lambda_min
        #     ~ N and the floor to O(0.1): NO solver can reach 1e-6 there
        #     in f32 — the round-3 bench criterion was unattainable.
        #   * the V(2,2) cycle with order-2 (bilinear) transfer is
        #     mesh-independent: <= 10 iterations at every size (ladder
        #     tests/test_multigrid.py::test_mg_mesh_independence_ladder);
        #     plain CG's measured time-to-the-same-tolerance is reported
        #     as cg_plain_est_s / cg_mg_speedup below.
        from krylov_tpu import MultigridPreconditioner
        from krylov_tpu import cg as cg_generic

        Mmg = MultigridPreconditioner(Ac)
        xstar = jnp.asarray(rng.standard_normal(Ac.grid), jnp.float32)
        b_mg = Ac @ xstar

        @jax.jit
        def solve_mg(b):
            _, info = cg_generic(
                Ac, b, M=Mmg, inner=lambda u, v: jnp.sum(u * v),
                tol=1e-6, maxiter=30, backend="while_loop",
            )
            return info.resnorms, jnp.asarray(info.numsteps), info.xk

        buf_mg, k_mg, x_mg = solve_mg(b_mg)
        float(jnp.sum(buf_mg))
        mg_s = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            buf_mg, k_mg, x_mg = solve_mg(b_mg)
            float(jnp.sum(buf_mg))
            mg_s = min(mg_s, time.perf_counter() - t0)
        kmg = int(k_mg)
        bmg = np.asarray(buf_mg)
        extras["cg_mg_ms"] = round(mg_s * 1e3, 2)
        extras["cg_mg_iters"] = kmg
        extras["cg_mg_converged"] = bool(
            bmg[kmg] <= 1e-6 * bmg[0] + 1e-15
        )
        # forward error of the converged iterate against the manufactured
        # solution (the criterion the residual test stands in for)
        fwd = float(
            jnp.linalg.norm((x_mg - xstar).ravel())
            / jnp.linalg.norm(xstar.ravel())
        )
        extras["cg_mg_fwd_err"] = float(f"{fwd:.3g}")

        # plain-CG comparison on the same system: measure the asymptotic
        # residual rate over 1500 iterations and extrapolate iterations /
        # time to the same 1e-6 tolerance (running it to convergence
        # would take minutes; the rate is stable after ~1000 iterations)
        @jax.jit
        def solve_plain(b):
            _, info = cg_stencil(
                Ac, b, tol=0.0, atol=0.0, maxiter=1500, fused=True
            )
            return info.resnorms

        bufp = solve_plain(b_mg)
        float(jnp.sum(bufp))
        t0 = time.perf_counter()
        bufp = solve_plain(b_mg)
        float(jnp.sum(bufp))
        plain_s = time.perf_counter() - t0
        bp = np.asarray(bufp)
        rel1500 = float(bp[1500] / bp[0])
        extras["cg_plain_1500_rel"] = float(f"{rel1500:.3g}")
        crossed = np.flatnonzero(bp <= 1e-6 * bp[0])
        if crossed.size:
            # measured time-to-tolerance (the loop ran all 1500
            # iterations at fixed cost, so per-iteration scaling is exact)
            k_tol = int(crossed[0])
            est_s = plain_s * k_tol / 1500
        else:
            # extrapolate from the asymptotic second-half contraction
            rate = (bp[1500] / bp[750]) ** (1.0 / 750)
            k_tol = int(
                1500 + np.log(1e-6 / max(rel1500, 1e-30)) / np.log(rate)
            ) if rate < 1 else -1
            est_s = plain_s / 1500 * k_tol if k_tol > 0 else float("nan")
        extras["cg_plain_iters_to_tol"] = k_tol
        extras["cg_plain_est_s"] = round(est_s, 3)
        extras["cg_mg_speedup"] = round(est_s / mg_s, 1)

        # ---- solver time-to-tolerance on a 1M-row Poisson CSR through
        # the PET kernel (BASELINE configs 1 and 4: GMRES on the
        # nonsymmetric variant; Jacobi-preconditioned BiCGSTAB/QMR on the
        # SPD one).  The Laplacian is shifted (+0.5 I) so f32
        # time-to-tolerance is meaningful at bench runtime; the operator
        # and preconditioner are jit ARGUMENTS (closure constants would
        # overflow the remote-compile tunnel).
        from krylov_tpu import DiagonalOperator, bicgstab, gmres, qmr
        from krylov_tpu.ops.pallas_spmv import PETOperator

        npg = 1024
        Np = npg * npg
        lap = scipy.sparse.diags(
            [-1.0, -1.0, 4.5, -1.0, -1.0],
            [-npg, -1, 0, 1, npg],
            shape=(Np, Np), format="csr", dtype=np.float32,
        )
        b_p = jnp.asarray(rng.standard_normal(Np), jnp.float32)

        def time_solve(tag, solver_fn, op, Mop, maxiter, **skw):
            @partial(jax.jit, static_argnames=("mi",))
            def run_solve(op, Mop, bv, mi=maxiter):
                kw = dict(skw)
                if Mop is not None:
                    kw["Ml" if solver_fn in (bicgstab, qmr) else "M"] = Mop
                _, info = solver_fn(
                    op, bv, tol=1e-4, maxiter=mi,
                    backend="while_loop", **kw,
                )
                return info.resnorms, jnp.asarray(info.numsteps)

            buf, steps = run_solve(op, Mop, b_p)
            float(jnp.sum(buf))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                buf, steps = run_solve(op, Mop, b_p)
                float(jnp.sum(buf))
                best = min(best, time.perf_counter() - t0)
            k = int(steps)
            bufh = np.asarray(buf)
            converged = bool(bufh[k] <= 1e-4 * bufh[0] + 1e-15)
            extras[f"{tag}_ms"] = round(best * 1e3, 2)
            extras[f"{tag}_iters"] = k
            extras[f"{tag}_converged"] = converged

        Ap = PETOperator.from_scipy(lap, with_rmatvec=True)
        Mj = DiagonalOperator(
            jnp.asarray(1.0 / np.asarray(lap.diagonal(), np.float32))
        )
        time_solve("bicgstab", bicgstab, Ap, Mj, 400)
        time_solve("qmr", qmr, Ap, Mj, 400)

        # nonsymmetric: convection term breaks symmetry -> GMRES (MGS and
        # compiled householder); full GMRES, modest maxiter (basis is
        # (maxiter+1, N))
        conv = scipy.sparse.diags(
            [-0.4, 0.4], [-1, 1], shape=(Np, Np), format="csr",
            dtype=np.float32,
        )
        Ag = PETOperator.from_scipy(
            (lap + conv).tocsr(), with_rmatvec=False
        )
        time_solve("gmres", gmres, Ag, None, 120)
        time_solve(
            "gmres_householder", gmres, Ag, None, 120, ortho="householder"
        )
        # batched classical Gram-Schmidt: one Gram contraction per sweep
        # instead of k+1 dependent inner products
        time_solve("gmres_cgs", gmres, Ag, None, 120, ortho="cgs")

        # ---- AMG: smoothed-aggregation V-cycle on the UNSHIFTED 1M-row
        # Poisson (cond ~ N — the case single-level preconditioning
        # cannot fix).  Setup is one host pass; every level's matvec
        # rides the PET kernel, the coarse inverse is one MXU matmul.
        from krylov_tpu import AMGPreconditioner

        lap0 = scipy.sparse.diags(
            [-1.0, -1.0, 4.0, -1.0, -1.0],
            [-npg, -1, 0, 1, npg],
            shape=(Np, Np), format="csr", dtype=np.float32,
        )
        # the solve's own operator is built FIRST and reused as the
        # cycle's fine level (fine_operator=): what a real user pays —
        # the operator exists for the solve regardless, and duplicating
        # the largest device buffer was pure waste.  Its build time is
        # reported separately.
        t0 = time.perf_counter()
        Ap0 = PETOperator.from_scipy(lap0, with_rmatvec=False)
        extras["amg_fine_op_build_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        Mamg = AMGPreconditioner.from_scipy(
            lap0, dtype=np.float32, fine_operator=Ap0
        )
        extras["amg_setup_cold_s"] = round(time.perf_counter() - t0, 2)
        # steady-state setup (page-cache/alloc warm; what a user solving
        # a sequence of systems pays per matrix)
        t0 = time.perf_counter()
        Mamg = AMGPreconditioner.from_scipy(
            lap0, dtype=np.float32, fine_operator=Ap0
        )
        extras["amg_setup_s"] = round(time.perf_counter() - t0, 2)
        extras["amg_levels"] = list(Mamg.level_sizes)
        time_solve("cg_amg", cg_generic, Ap0, Mamg, 60)
        # single-level comparison point on the same system
        Mj0 = DiagonalOperator(
            jnp.asarray(1.0 / np.asarray(lap0.diagonal(), np.float32))
        )
        time_solve("cg_jacobi", cg_generic, Ap0, Mj0, 1500)

    target = 0.8 * peak
    payload = {
        "metric": "spmv_poisson2d_hbm_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
        "device": kind,
        "peak_gbps": peak,
        "n_rows": N,
        "nnz": nnz,
        "nnz_per_s": round(nnz / dt, 1),
        "spmv_us": round(dt * 1e6, 2),
        **extras,
    }
    _guard_payload(payload)
    print(json.dumps(payload))


def _guard_payload(payload):
    """Refuse to emit physically impossible numbers.

    Every numeric metric must be finite, and — except for the listed
    can-be-nonpositive keys — strictly positive.  A violation raises so
    the driver records a failed bench instead of a plausible-looking
    garbage value (round-4 lesson: ``csr_pet_rcm_speedup: -65.07``)."""
    nonpositive_ok = {"cg_plain_iters_to_tol"}
    bad = []
    for k, v in payload.items():
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            continue
        if not np.isfinite(v):
            bad.append(f"{k}={v} (non-finite)")
        elif v <= 0 and k not in nonpositive_ok and not k.endswith("_iters"):
            bad.append(f"{k}={v} (non-positive)")
    if bad:
        raise RuntimeError("bench refuses to emit: " + ", ".join(bad))


if __name__ == "__main__":
    main()
