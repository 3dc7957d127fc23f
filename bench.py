"""Headline benchmark: 2-D Poisson (5-point) stencil SpMV throughput, 1 chip.

The SpMV is the hot inner op of every Krylov solver (SURVEY.md §3: one SpMV +
1-2 reductions per CG iteration) and is HBM-bandwidth-bound; the metric is
effective GB/s of the ideal-traffic model ``(ndiag + 2) * N * itemsize``
against the chip's roofline.  ``vs_baseline`` is measured bandwidth over the
80%-of-roofline target from BASELINE.md.

Timing methodology: through the remote-TPU tunnel ``block_until_ready`` can
return before device completion and a host roundtrip costs ~100ms, so each
measurement chains K matvecs inside one compiled ``lax.fori_loop``, forces
completion with a scalar readback, and differences two K values to cancel
all fixed overhead (dispatch, readback, loop entry).

Prints ONE JSON line:
  {"metric": "spmv_poisson2d_bandwidth", "value": <GB/s>, "unit": "GB/s",
   "vs_baseline": <value / (0.8 * peak)>, ...extras}
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


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from krylov_tpu.ops import stencil
    from krylov_tpu.solvers.cg import cg

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "cpu")
    on_tpu = dev.platform == "tpu"
    peak = _peak_gbps(kind) if on_tpu else 50.0  # rough CPU fallback

    # big enough that x/y stream from HBM too (x alone = 67 MB at 4096^2)
    nx = 4096 if on_tpu else 256
    N = nx * nx
    A = stencil.poisson_2d(nx, nx, dtype=np.float32)
    # scale so repeated application is numerically stable when chained
    A_bench = stencil.GridStencilOperator(
        A.coeffs * np.float32(0.124), A.offsets, A.ny, hermitian=True
    )
    rng = np.random.default_rng(0)
    # grid-shaped vectors: the fast path (no 1-D<->2-D relayout per matvec)
    x = jnp.asarray(rng.standard_normal(A.grid), jnp.float32)

    @partial(jax.jit, static_argnums=2)
    def chain(coeffs2d, v, K):
        op = stencil.GridStencilOperator(
            coeffs2d, A.offsets, A.ny, hermitian=True
        )
        return lax.fori_loop(0, K, lambda i, u: op @ u, v)

    def timed(K, reps):
        r = chain(A_bench.coeffs2d, x, K)
        float(jnp.sum(r))  # readback forces completion (compile + warm)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain(A_bench.coeffs2d, x, K)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        return best

    k_lo, k_hi, reps = (8, 136, 5) if on_tpu else (2, 10, 2)
    dt = (timed(k_hi, reps) - timed(k_lo, reps)) / (k_hi - k_lo)

    # constant-coefficient stencil (no coefficient arrays; in-kernel Dirichlet
    # masks): only x and y touch HBM -> ~3x the matvec rate
    Ac = stencil.poisson_2d_const(nx, nx, dtype=np.float32)
    Ac_bench = stencil.ConstStencilOperator(
        (nx, nx), Ac.offsets_nd, tuple(0.124 * w for w in Ac.weights), np.float32
    )

    @partial(jax.jit, static_argnums=1)
    def chain_const(v, K):
        return lax.fori_loop(0, K, lambda i, u: Ac_bench @ u, v)

    def timed_const(K, reps):
        r = chain_const(x, K)
        float(jnp.sum(r))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain_const(x, K)
            float(jnp.sum(r))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_const = (timed_const(k_hi, reps) - timed_const(k_lo, reps)) / (k_hi - k_lo)

    # bf16: halves the x/y stream (f32 accumulation inside the kernel)
    Ab16 = stencil.ConstStencilOperator(
        (nx, nx), Ac.offsets_nd,
        tuple(0.124 * w for w in Ac.weights), jnp.bfloat16,
    )
    x16 = x.astype(jnp.bfloat16)

    @partial(jax.jit, static_argnums=1)
    def chain_bf16(v, K):
        return lax.fori_loop(0, K, lambda i, u: Ab16 @ u, v)

    def timed_bf16(K, reps):
        r = chain_bf16(x16, K)
        float(jnp.sum(r.astype(jnp.float32)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chain_bf16(x16, K)
            float(jnp.sum(r.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best

    dt_bf16 = (timed_bf16(k_hi, reps) - timed_bf16(k_lo, reps)) / (k_hi - k_lo)

    ndiag = A.coeffs.shape[0]
    bytes_moved = (ndiag + 2) * N * 4
    gbps = bytes_moved / dt / 1e9
    nnz = int(A.nnz)
    nnz_per_s = nnz / dt

    # secondary metric: compiled CG, 100 iterations on the const-stencil
    # operator, grid-shaped vectors with a full-contraction inner product
    b = jnp.ones(Ac.grid, jnp.float32)

    def grid_inner(u, v):
        return jnp.sum(u * v)

    @jax.jit
    def solve(b):
        _, info = cg(
            Ac, b, inner=grid_inner, tol=0.0, atol=0.0,
            maxiter=100, backend="while_loop",
        )
        return info.resnorms

    r = solve(b)
    float(jnp.sum(r))
    cg_s = float("inf")
    for _ in range(max(1, reps - 2)):
        t0 = time.perf_counter()
        r = solve(b)
        float(jnp.sum(r))
        cg_s = min(cg_s, time.perf_counter() - t0)

    target = 0.8 * peak
    print(json.dumps({
        "metric": "spmv_poisson2d_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / target, 4),
        "device": kind,
        "peak_gbps": peak,
        "n_rows": N,
        "nnz": nnz,
        "nnz_per_s": round(nnz_per_s, 1),
        "spmv_us": round(dt * 1e6, 2),
        "const_spmv_us": round(dt_const * 1e6, 2),
        "const_nnz_per_s": round(int(Ac.nnz) / dt_const, 1),
        "bf16_const_spmv_us": round(dt_bf16 * 1e6, 2),
        "bf16_const_nnz_per_s": round(int(Ac.nnz) / dt_bf16, 1),
        "cg100_ms": round(cg_s * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
