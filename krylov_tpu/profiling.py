"""Profiling and observability.

The reference's only observability is the ``Info`` result and the analytic
``num_operations`` cost dictionaries (reference: src/krylov/cg.py:243-250,
gmres.py:240-247, minres.py:242-249).  This module keeps that cost model and
adds the TPU-side instrumentation the reference never needed:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of a solve,
* :func:`timed_solve` — wall-clock a solve with completion forced by a
  readback (through remote-TPU tunnels ``block_until_ready`` can return
  before device completion — see bench.py),
* :func:`spmv_traffic_model` / :func:`roofline_report` — the ideal-traffic
  byte counts per operator type and the achieved-fraction-of-roofline
  summary used by bench.py and the weak-scaling harness.
"""

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

# HBM peak bandwidth per chip (GB/s), by jax device_kind
PEAK_GBPS = {
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


def peak_gbps(device=None) -> float:
    """Best-known HBM peak bandwidth of ``device`` (default: first device)."""
    device = jax.devices()[0] if device is None else device
    kind = getattr(device, "device_kind", "cpu")
    if kind in PEAK_GBPS:
        return PEAK_GBPS[kind]
    for k, v in sorted(PEAK_GBPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return float("nan")


@contextlib.contextmanager
def trace(logdir="/tmp/krylov_tpu_trace"):
    """``with profiling.trace(): solve(...)`` — TensorBoard trace of a solve."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(x):
    """Force device completion via a scalar readback (tunnel-safe)."""
    return float(jnp.real(jnp.sum(jax.tree_util.tree_leaves(x)[0])))


def timed_solve(solve_fn, *args, warmup=True, **kwargs):
    """Run ``solve_fn(*args, **kwargs)``, return ``(result, seconds)``.

    Completion is forced by a readback on the first output leaf, so the
    timing is valid through remote-device tunnels where
    ``block_until_ready`` is unreliable.
    """
    if warmup:
        sync(solve_fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = solve_fn(*args, **kwargs)
    sync(out)
    return out, time.perf_counter() - t0


def spmv_traffic_model(A, dtype=None) -> int:
    """Ideal HBM bytes of one ``A @ x`` for the operator types here.

    * ConstStencilOperator: x read + y write (weights are compile-time)
    * Banded/GridStencil:  coefficient planes + x + y
    * CSR: data + indices + x gathers (counted once) + y
    * PET: padded slot-lanes x (value + 1-byte index) + windows + y
    * dense: matrix + x + y
    """
    itemsize = np.dtype(dtype or getattr(A, "dtype", np.float32)).itemsize
    n = A.shape[0]
    kind = type(A).__name__
    if kind == "ConstStencilOperator":
        return 2 * n * itemsize
    if kind == "PETOperator":
        pet = A._pet
        slot_lanes = pet["nchunks"] * pet["lc"] * 128
        # value stream + int8 column stream + per-chunk metadata tile +
        # x window fetches (>= one x pass) + y write
        base = (
            slot_lanes * (A.dtype.itemsize + 1)
            + pet["nchunks"] * 8 * 128 * 4
            + pet["pages_pad"] * 128 * 4
            + n * 4
        )
        if getattr(A, "_perm", None) is not None:
            # hidden reorder gathers: x into B-order and y back
            # (index read + src read + dst write, both directions)
            base += 2 * 3 * n * 4
        return base
    if hasattr(A, "coeffs2d") or hasattr(A, "coeffs"):
        ndiag = (
            A.coeffs2d.shape[0] if hasattr(A, "coeffs2d") else A.coeffs.shape[0]
        )
        return (ndiag + 2) * n * itemsize
    if hasattr(A, "indptr"):  # CSR
        nnz = int(A.nnz)
        return nnz * (itemsize + 4) + 2 * n * itemsize
    return (n * n + 2 * n) * itemsize  # dense


def roofline_report(A, seconds_per_matvec, device=None) -> dict:
    """Achieved bandwidth and fraction of roofline for one SpMV."""
    bytes_ideal = spmv_traffic_model(A)
    gbps = bytes_ideal / seconds_per_matvec / 1e9
    peak = peak_gbps(device)
    return {
        "bytes_ideal": bytes_ideal,
        "achieved_gbps": gbps,
        "peak_gbps": peak,
        "fraction_of_roofline": gbps / peak,
        "nnz_per_s": float(getattr(A, "nnz", 0)) / seconds_per_matvec,
    }
