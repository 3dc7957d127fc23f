"""TPU-hardware smoke test: real-chip f32 solves with residual checks.

The pytest suite runs on CPU in f64 (numerical parity with the reference);
this tool exercises the actual TPU compute paths — Pallas stencil kernels,
fused CG, BSR MXU SpMM, sharded solve via shard_map — and checks explicit
residuals at f32-appropriate tolerances.  Prints one JSON line per check
plus an overall verdict; exits nonzero on failure.

    python tools/tpu_smoke.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse

    import krylov_tpu as krylov
    from krylov_tpu import parallel
    from krylov_tpu.ops import stencil
    from krylov_tpu.ops.bsr import BSROperator

    rng = np.random.default_rng(0)
    failures = []
    n_checks = [0]

    def check(name, relres, tol):
        ok = bool(relres <= tol)
        n_checks[0] += 1
        print(json.dumps({"check": name, "relres": float(relres),
                          "tol": tol, "ok": ok}))
        if not ok:
            failures.append(name)

    def relres(A, x, b):
        r = np.asarray(b).reshape(-1) - np.asarray(
            A @ jnp.asarray(x)
        ).reshape(-1)
        return np.linalg.norm(r) / np.linalg.norm(np.asarray(b).reshape(-1))

    # 1. grid-stencil CG (Pallas variable-coefficient kernel)
    A = stencil.poisson_2d(256, 256, dtype=np.float32)
    b = jnp.asarray(rng.standard_normal(256 * 256), jnp.float32)
    sol, info = krylov.cg(A, b, tol=1e-4, maxiter=2000, backend="while_loop")
    check("cg_grid_stencil", relres(A, info.xk, b), 5e-4)

    # 2. fused CG on the const-stencil kernel
    Ac = stencil.poisson_2d_const(256, 256, dtype=np.float32)
    sol, info = krylov.cg_stencil(Ac, b, tol=1e-4, maxiter=2000, fused=True)
    check("cg_stencil_fused", relres(Ac, info.xk, b), 5e-4)

    # 2b. fused CG on the VARIABLE-coefficient stencil kernel
    a = np.asarray(0.5 + rng.random((256, 256)), np.float32)
    Av = stencil.diffusion_2d(a)
    sol, info = krylov.cg_stencil(Av, b, tol=1e-4, maxiter=2000, fused=True)
    check("cg_stencil_var_fused", relres(Av, info.xk, b), 5e-4)

    # 2c. fused Jacobi-preconditioned CG (dinv streamed through both phases)
    sol, info = krylov.cg_stencil(
        Av, b, tol=1e-4, maxiter=2000, fused=True, M="jacobi"
    )
    check("cg_stencil_var_fused_jacobi", relres(Av, info.xk, b), 5e-4)

    # 3. GMRES(m) compiled
    sol, info = krylov.gmres(
        A, b, restart=60, tol=1e-3, maxiter=400, backend="while_loop"
    )
    check("gmres_restarted", relres(A, info.xk, b), 5e-3)

    # 3b. GMRES(m) with batched-CGS orthogonalization (one Gram
    # contraction per sweep)
    sol, info = krylov.gmres(
        A, b, restart=60, ortho="cgs", tol=1e-3, maxiter=400,
        backend="while_loop",
    )
    check("gmres_restarted_cgs", relres(A, info.xk, b), 5e-3)

    # 4. MINRES compiled
    sol, info = krylov.minres(A, b, tol=1e-3, maxiter=1500,
                              backend="while_loop")
    check("minres", relres(A, info.xk, b), 5e-3)

    # 5. sharded const-stencil CG (shard_map + in-kernel global-row masks)
    mesh = parallel.make_mesh()
    sol, info = parallel.sharded_solve(
        krylov.cg, Ac, b, mesh=mesh, tol=1e-4, maxiter=2000
    )
    check("sharded_const_cg", relres(Ac, info.xk, b), 5e-4)

    # 6. BSR MXU SpMM consistency vs dense
    n = 512
    dense = np.zeros((n, n), np.float32)
    for i in range(0, n, 128):
        for j in range(0, n, 128):
            if rng.random() < 0.5 or i == j:
                dense[i:i+128, j:j+128] = rng.standard_normal((128, 128))
    Ab = BSROperator.from_scipy(
        scipy.sparse.csr_matrix(dense), blocksize=(128, 128)
    )
    X = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
    Y = np.asarray(Ab @ X)
    err = np.abs(Y - dense @ np.asarray(X)).max() / (np.abs(Y).max() + 1e-9)
    check("bsr_mxu_spmm", err, 1e-5)

    # 7b. PET Pallas CSR SpMV vs scipy on an irregular matrix (compiled)
    from krylov_tpu.ops.pallas_spmv import PETOperator

    npet = 1 << 16
    row_nnz = rng.integers(5, 30, npet)
    pnnz = int(row_nnz.sum())
    indptr = np.zeros(npet + 1, np.int64)
    indptr[1:] = np.cumsum(row_nnz)
    rr = np.repeat(np.arange(npet), row_nnz)
    cc = np.clip(rr + rng.integers(-256, 256, pnnz), 0, npet - 1)
    sp_pet = scipy.sparse.csr_matrix(
        (rng.standard_normal(pnnz).astype(np.float32),
         cc.astype(np.int32), indptr),
        shape=(npet, npet),
    )
    Ap = PETOperator.from_scipy(sp_pet, with_rmatvec=False, interpret=False)
    xp = jnp.asarray(rng.standard_normal(npet), jnp.float32)
    yp = np.asarray(Ap @ xp)
    yw = sp_pet @ np.asarray(xp)
    err = np.abs(yp - yw).max() / (np.abs(yw).max() + 1e-9)
    check("pet_csr_spmv", err, 1e-5)

    # 7b'. PET SpMM (blocked multi-RHS through the wide-lane kernel)
    Xp8 = jnp.asarray(rng.standard_normal((npet, 8)), jnp.float32)
    Yp8 = np.asarray(Ap @ Xp8)
    Yw8 = sp_pet @ np.asarray(Xp8)
    err = np.abs(Yp8 - Yw8).max() / (np.abs(Yw8).max() + 1e-9)
    check("pet_csr_spmm_rhs8", err, 1e-5)

    # 7b''. RCM-reordered PET on a scrambled matrix: user-order semantics
    # through the hidden permutation, and the fill must improve
    pscr = rng.permutation(npet)
    sp_scr = sp_pet[pscr][:, pscr].tocsr()
    A_scr = PETOperator.from_scipy(sp_scr, with_rmatvec=False,
                                   interpret=False, reorder="rcm")
    y_r = np.asarray(A_scr @ xp)
    y_w = sp_scr @ np.asarray(xp)
    err = np.abs(y_r - y_w).max() / (np.abs(y_w).max() + 1e-9)
    check("pet_csr_rcm_reorder_spmv", err, 1e-5)

    # 7c. pipelined and block CG on the real chip (compiled)
    sol, info = krylov.cg_pipelined(
        A, b, tol=1e-3, maxiter=2000, backend="while_loop"
    )
    check("cg_pipelined", relres(A, info.xk, b), 5e-3)

    B3 = jnp.asarray(rng.standard_normal((256 * 256, 3)), jnp.float32)
    solb, infob = krylov.cg_block(
        A, B3, tol=1e-3, maxiter=2000, backend="while_loop"
    )
    Rb = np.asarray(B3) - np.asarray(A @ infob.xk)
    rel_b = np.linalg.norm(Rb) / np.linalg.norm(np.asarray(B3))
    check("cg_block_multirhs", rel_b, 5e-3)

    # 6c. multigrid-preconditioned CG (the V-cycle inlines into the
    # compiled while_loop; iterations collapse to ~15)
    from krylov_tpu import MultigridPreconditioner

    Mmg = MultigridPreconditioner(Ac)
    # tol 1e-5: the f32 attainable-residual floor for random b at 256^2
    # sits at ~3e-6 relative (eps * ||A|| ||x|| / ||b||, ||x|| ~ 1/lmin);
    # 1e-6 is unreachable by ANY solver in f32 here (see bench.py's
    # manufactured-RHS note for the full accounting)
    solm, infom = krylov.cg(
        Ac, b, M=Mmg, inner=lambda u, v: jnp.sum(u * v),
        tol=1e-5, maxiter=60, backend="while_loop",
    )
    check("cg_multigrid", relres(Ac, infom.xk, b), 1e-4)
    if int(infom.numsteps) > 30:
        failures.append(f"cg_multigrid took {int(infom.numsteps)} iters")

    # 6d. smoothed-aggregation AMG on a raw CSR Poisson (levels route to
    # PET on TPU; coarse solve is one dense matmul)
    import scipy.sparse
    from krylov_tpu import AMGPreconditioner

    nam = 96
    Tam = scipy.sparse.diags(
        [-np.ones(nam - 1), 2 * np.ones(nam), -np.ones(nam - 1)],
        [-1, 0, 1],
    )
    Aam = (
        scipy.sparse.kron(scipy.sparse.eye(nam), Tam)
        + scipy.sparse.kron(Tam, scipy.sparse.eye(nam))
    ).tocsr().astype(np.float32)
    Mam = AMGPreconditioner.from_scipy(Aam, dtype=np.float32)
    bam = jnp.asarray(rng.standard_normal(nam * nam), jnp.float32)
    solam, infoam = krylov.cg(
        Aam, bam, M=Mam, tol=1e-5, maxiter=60, backend="while_loop"
    )
    ram = np.asarray(bam) - Aam @ np.asarray(infoam.xk)
    check(
        "cg_amg",
        float(np.linalg.norm(ram) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )
    if int(infoam.numsteps) > 30:
        failures.append(f"cg_amg took {int(infoam.numsteps)} iters")

    # 6e. block-Jacobi (batched MXU block inverses): line blocks on a
    # 100:1 anisotropic Poisson, where pointwise Jacobi is inert
    from krylov_tpu import BlockJacobiPreconditioner

    Tbj = scipy.sparse.diags(
        [-np.ones(nam - 1), 2 * np.ones(nam), -np.ones(nam - 1)],
        [-1, 0, 1],
    )
    Abj = (
        scipy.sparse.kron(scipy.sparse.eye(nam), 100.0 * Tbj)
        + scipy.sparse.kron(Tbj, scipy.sparse.eye(nam))
    ).tocsr().astype(np.float32)
    Mbj = BlockJacobiPreconditioner.from_scipy(
        Abj, block=nam, dtype=np.float32
    )
    solbj, infobj = krylov.cg(
        Abj, bam, M=Mbj, tol=1e-5, maxiter=120, backend="while_loop"
    )
    rbj = np.asarray(bam) - Abj @ np.asarray(infobj.xk)
    check(
        "cg_blockjacobi_line",
        float(np.linalg.norm(rbj) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )
    if int(infobj.numsteps) > 60:
        failures.append(f"cg_blockjacobi took {int(infobj.numsteps)} iters")

    # 6e2. ILU(0)-preconditioned GMRES (scan-based triangular sweeps on
    # device; wavefront-shallow levels by construction)
    from krylov_tpu import ILUPreconditioner

    Milu = ILUPreconditioner.from_scipy(Abj, dtype=np.float32)
    solil, infoil = krylov.gmres(
        Abj, bam, Ml=Milu, tol=1e-5, maxiter=60, backend="while_loop"
    )
    ril = np.asarray(bam) - Abj @ np.asarray(infoil.xk)
    check(
        "gmres_ilu0",
        float(np.linalg.norm(ril) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )

    # 6f. the M_partition route end-to-end on device (1-chip mesh):
    # distributed AMG's psum restriction + replicated tail inside shard_map
    part1 = parallel.partition_amg(Aam, 1, dtype=np.float32)
    solmp, infomp = parallel.sharded_solve(
        krylov.cg, Aam, bam, mesh=parallel.make_mesh(1),
        M_partition=part1, tol=1e-5, maxiter=60,
    )
    rmp = np.asarray(bam) - Aam @ np.asarray(infomp.xk)
    check(
        "sharded_amg_mpartition",
        float(np.linalg.norm(rmp) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )

    # 6g. round-3 solver families on-device: TFQMR and LSQR through the
    # sharded (1-chip mesh) route, and the block-Jacobi M_partition
    sol_tf, info_tf = parallel.sharded_solve(
        krylov.tfqmr, Aam, bam, mesh=parallel.make_mesh(1),
        tol=1e-5, maxiter=400,
    )
    rtf = np.asarray(bam) - Aam @ np.asarray(info_tf.xk)
    check(
        "sharded_tfqmr",
        float(np.linalg.norm(rtf) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )
    sol_ls, info_ls = parallel.sharded_solve(
        krylov.lsqr, Aam, bam, mesh=parallel.make_mesh(1),
        tol=1e-5, maxiter=400,
    )
    rls = np.asarray(bam) - Aam @ np.asarray(info_ls.xk)
    # LSQR iterates the normal equations (cond^2): 400 iterations on the
    # unshifted Poisson reach ~2e-2 — this is a path check, not a
    # convergence bar
    check(
        "sharded_lsqr",
        float(np.linalg.norm(rls) / np.linalg.norm(np.asarray(bam))),
        5e-2,
    )
    partbj = parallel.partition_block_jacobi(Aam, 1, block=64,
                                             dtype=np.float32)
    sol_bj, info_bj = parallel.sharded_solve(
        krylov.cg, Aam, bam, mesh=parallel.make_mesh(1),
        M_partition=partbj, tol=1e-5, maxiter=200,
    )
    rbj = np.asarray(bam) - Aam @ np.asarray(info_bj.xk)
    check(
        "sharded_blockjacobi_mpartition",
        float(np.linalg.norm(rbj) / np.linalg.norm(np.asarray(bam))),
        1e-3,
    )

    # 6h. mixed-precision iterative refinement on-chip: bf16 inner CG
    # (half the HBM traffic per matvec) + f32 defect correction must
    # recover f32-level accuracy (round-4 verdict item 9)
    Alow = stencil.ConstStencilOperator(
        (256, 256), Ac.offsets_nd, Ac.weights, jnp.bfloat16
    )
    solrf, inforf = krylov.refine(
        Ac, b, A_low=Alow, inner_tol=1e-2, inner_maxiter=200,
        tol=1e-4, maxiter=20, backend="while_loop",
        inner=lambda u, v: jnp.sum(jnp.conj(u) * v),
    )
    check("refine_bf16_inner", relres(Ac, inforf.xk, b), 5e-4)

    # 6i. differentiable solve on-chip: implicit-function-theorem grad
    # through a compiled CG, checked against a directional finite
    # difference (loose f32 band — this is a path check on the adjoint
    # solve, the tight parity lives in tests/test_diffable.py)
    from krylov_tpu import diffable

    nd = 64
    Ad0 = stencil.poisson_2d(nd, nd, dtype=np.float32)
    bd = jnp.asarray(rng.standard_normal((nd, nd)), jnp.float32)

    def loss(c2):
        Aop = stencil.GridStencilOperator(
            c2, Ad0.offsets, Ad0.ny, hermitian=True
        )
        x = diffable.solve(
            Aop, bd, params=(c2,),
            make_op=lambda c: stencil.GridStencilOperator(
                c, Ad0.offsets, Ad0.ny, hermitian=True
            ),
            tol=1e-6, maxiter=800, backend="while_loop",
            inner=lambda u, v: jnp.sum(jnp.conj(u) * v),
        )
        return jnp.sum(x * x)

    g = jax.jit(jax.grad(loss))(Ad0.coeffs2d)
    dirn = jnp.asarray(
        rng.standard_normal(Ad0.coeffs2d.shape), jnp.float32
    )
    eps = 1e-3
    fd = (loss(Ad0.coeffs2d + eps * dirn) - loss(Ad0.coeffs2d - eps * dirn)) / (
        2 * eps
    )
    got = float(jnp.sum(g * dirn))
    err_g = abs(got - float(fd)) / (abs(float(fd)) + 1e-6)
    check("diffable_grad_fd", err_g, 5e-2)

    # 7. bf16 const-stencil matvec consistency
    x16 = jnp.asarray(rng.standard_normal(Ac.grid), jnp.bfloat16)
    A16 = stencil.ConstStencilOperator(
        (256, 256), Ac.offsets_nd, Ac.weights, jnp.bfloat16
    )
    y16 = np.asarray((A16 @ x16).astype(jnp.float32))
    y32 = np.asarray(Ac @ x16.astype(jnp.float32))
    err = np.abs(y16 - y32).max() / (np.abs(y32).max() + 1e-9)
    check("bf16_const_matvec", err, 2e-2)

    if failures:
        print(json.dumps({"verdict": "FAIL", "failures": failures}))
        sys.exit(1)
    print(json.dumps({"verdict": "PASS", "checks": n_checks[0],
                      "device": getattr(jax.devices()[0], "device_kind", "?")}))


if __name__ == "__main__":
    main()
