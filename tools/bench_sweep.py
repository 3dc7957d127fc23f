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

    # the operator is a pytree ARGUMENT, never a closure constant: closed-over
    # device arrays are baked into the program as literals (and the remote
    # compile tunnel rejects >100MB request bodies)
    @partial(jax.jit, static_argnums=2)
    def chain(op, v, K):
        return lax.fori_loop(0, K, lambda i, u: op @ u, v)

    def timed_chain(op, x, k_lo=8, k_hi=72, reps=3):
        def t(K):
            r = chain(op, x, K)
            float(jnp.sum(r.astype(jnp.float32)))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                r = chain(op, x, K)
                float(jnp.sum(r.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(k_hi) - t(k_lo)) / (k_hi - k_lo)

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
            dt = timed_chain(Avs, x)
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
        dt = timed_chain(Acs, x)
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
        dt = timed_chain(Ab, x.astype(jnp.bfloat16))
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


if __name__ == "__main__":
    main()
