"""Weak-scaling curves on a VIRTUAL device mesh + ICI/DCN prediction model.

Real multi-host hardware is not available in this environment, so this
driver produces the committable part of the BASELINE weak-scaling evidence:

1. empirical 1/2/4/8-device weak-scaling curves on the CPU virtual mesh
   (``xla_force_host_platform_device_count``) for **standard CG** and the
   **pipelined (single-psum) CG**, plus a block-CG point -- this exercises
   the REAL sharded code path (halo ppermutes + psum reductions inside the
   shard_map'd while_loop), just not real ICI links.  The virtual curve is
   a CPU-contention proxy: its absolute efficiencies UNDERSTATE hardware
   (all shards share one socket's memory bandwidth), but the *relative*
   gap between solvers is real because it comes from the number of
   synchronization points per iteration;
2. an analytic communication model for the same solve on TPU hardware at
   4/8/16 chips and at 2 hosts (DCN boundary), predicting efficiency
   against the >=75% BASELINE target for both solvers.

Usage::

    python tools/weak_scaling_virtual.py --out WEAKSCALE.json

Model inputs (stated, since scalar-collective latency cannot be measured
with the single chip available here):

* per-iteration compute streams ~7 words/row at HBM speed (measured
  443 us at 4.2M rows/chip: bench.py ``stream_spmv_us`` scaled, v5e
  819 GB/s);
* a scalar ``psum`` over n chips on a 1-D ICI ring costs
  ``base + 2*(n-1)*hop`` (ring allreduce, latency-bound; hop ~1 us on
  ICI); crossing a DCN host boundary adds ``dcn_lat`` per crossing
  (~25 us round trip);
* the halo exchange (2*ny*4 bytes to each neighbor) is OVERLAPPED with
  the zero-halo local kernel (parallel/grid.py), so it contributes only
  its issue overhead until it exceeds the local compute time.

Per iteration, standard CG needs 2 *dependent* scalar psums (pAp, then
rho after the preconditioner apply); pipelined CG fuses all of an
iteration's scalars into ONE psum at the cost of ~2.15x vector work; block
CG amortizes one (k, k)-Gram psum over k RHS columns.
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(n_dev, rows_per_dev, iters, ny, solver, operator="grid"):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "weak_scaling.py"),
            "--rows-per-device", str(rows_per_dev),
            "--iters", str(iters),
            "--ny", str(ny),
            "--virtual-devices", str(n_dev),
            "--solver", solver,
            "--operator", operator,
        ],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def tpu_model(
    rows_per_dev,
    ny,
    hbm_gbps=819.0,
    ici_hop_us=1.0,
    psum_base_us=2.0,
    dcn_lat_us=25.0,
    ici_gbps=45.0,
    pipelined_compute_overhead=2.154,
):
    """Predict per-solver weak-scaling efficiency per chip count / hosts.

    Weak-scaling efficiency of solver S = t_S(1 chip) / t_S(n chips) per
    iteration at fixed rows/chip; each solver's own compute cost cancels,
    so the metric is ``t_work / (t_work + t_sync)`` with ``t_work`` that
    solver's per-iteration compute and ``t_sync`` its non-overlappable
    synchronization.

    * scalar ``psum`` = hierarchical allreduce: ring over the host's
      chips (``base + 2*(c-1)*hop``) plus one DCN reduce+broadcast
      (``2*dcn_lat``) when hosts > 1;
    * standard CG: 2 *dependent* scalar psums per iteration (pAp, then
      rho) — neither overlappable (each gates the next vector op);
    * pipelined CG (Ghysels--Vanroose): ONE fused psum whose result is
      not needed until after the next matvec, so the collective can
      overlap with compute — reported as two bounds, no-overlap and
      full-overlap (the implementation emits the psum with no data
      dependence on the following matvec; XLA may schedule them
      concurrently).  Compute overhead vs CG is ``pipelined_compute_
      overhead`` (measured 2.15x on the real v5e via make_sharded_solver
      maxiter-slopes, round 5);
    * block CG, k RHS: one (k, k)-Gram psum amortized over k columns of
      work;
    * the halo exchange is overlapped with the zero-halo kernel
      (parallel/grid.py) and only its residual beyond compute counts.
    """
    halo_us = 2 * ny * 4 / (ici_gbps * 1e9) * 1e6

    def psum_us(n_chips, n_hosts=1):
        c = n_chips // n_hosts
        t = psum_base_us + 2 * (c - 1) * ici_hop_us
        if n_hosts > 1:
            t += 2 * dcn_lat_us
        return t

    def scenario(t_comp):
        halo_residual = max(0.0, halo_us - t_comp)

        def entry(p):
            tp = t_comp * pipelined_compute_overhead
            k = 4
            pipe_no_ov = tp / (tp + p + halo_residual)
            pipe_full_ov = tp / (tp + max(0.0, p - t_comp) + halo_residual)
            return {
                "psum_us": round(p, 1),
                "eff_cg": round(
                    t_comp / (t_comp + 2 * p + halo_residual), 4
                ),
                "eff_cg_pipelined_no_overlap": round(pipe_no_ov, 4),
                "eff_cg_pipelined_full_overlap": round(pipe_full_ov, 4),
                "eff_cg_block_k4": round(
                    t_comp / (t_comp + p / k + halo_residual), 4
                ),
            }

        sc = {
            "t_comp_us_per_iter": round(t_comp, 1),
            "per_chips": {n: entry(psum_us(n)) for n in (4, 8, 16)},
        }
        e2 = entry(psum_us(16, n_hosts=2))
        e2["meets_75pct_target"] = {
            "cg": bool(e2["eff_cg"] >= 0.75),
            "cg_pipelined_no_overlap":
                bool(e2["eff_cg_pipelined_no_overlap"] >= 0.75),
            "cg_pipelined_full_overlap":
                bool(e2["eff_cg_pipelined_full_overlap"] >= 0.75),
            "cg_block_k4": bool(e2["eff_cg_block_k4"] >= 0.75),
        }
        sc["two_hosts_16chips"] = e2
        return sc

    # two compute-time scenarios bracket reality:
    # * "measured": full sharded-CG iteration measured on a real v5e at
    #   4.2M rows/chip via make_sharded_solver maxiter-slopes, round 5
    #   (404.8 us/iter; pipelined 871.8 us -> overhead 2.15x — the
    #   Ghysels-Vanroose recurrences stream ~2x the vectors; round 4's
    #   948/1264 figures carried the compiled driver's since-fixed
    #   per-iteration cond-copy overhead) — what the shipped solver
    #   actually costs per iteration;
    # * "streaming_floor": the 7-word HBM streaming bound for the matvec
    #   alone — the best possible compute time, hence the WORST-case
    #   efficiency (sync cost can never be better hidden than this).
    t_floor = 7 * rows_per_dev * 4 / (hbm_gbps * 1e9) * 1e6
    return {
        "assumptions": {
            "halo_us_overlapped": round(halo_us, 2),
            "ici_hop_us": ici_hop_us,
            "psum_base_us": psum_base_us,
            "dcn_lat_us": dcn_lat_us,
            "pipelined_compute_overhead": pipelined_compute_overhead,
            "measured_cg_us_per_iter_v5e": 404.8,
            "measured_pipelined_us_per_iter_v5e": 871.8,
        },
        "measured": scenario(404.8),
        "streaming_floor": scenario(t_floor),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows-per-device", type=int, default=1 << 18)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--ny", type=int, default=512)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    curves = {}
    for solver, operator in (
        ("cg", "grid"), ("cg_pipelined", "grid"),
        # round-3 verdict item 10: the sharded PET and BSR matvec paths
        # measured on the same weak-scaling ladder, not just grid CG
        ("cg", "csr_pet"), ("cg", "bsr"),
    ):
        curve = []
        for n in args.devices:
            r = run_one(
                n, args.rows_per_device, args.iters, args.ny, solver,
                operator,
            )
            curve.append(r)
            print(json.dumps(r), flush=True)
        base = curve[0]["nnz_per_s_per_device"]
        for r in curve:
            r["efficiency_vs_1dev"] = round(
                r["nnz_per_s_per_device"] / base, 4
            )
        curves[(solver, operator)] = curve

    # single block-CG point at the largest device count (amortized psums)
    nmax = args.devices[-1]
    blk = run_one(nmax, args.rows_per_device, args.iters, args.ny, "cg_block")
    print(json.dumps(blk), flush=True)

    model = tpu_model(1 << 22, 4096)
    # machine-readable 2-host conclusion per compute scenario (the claim
    # AND its condition at top level, not buried in the note)
    conclusion = {"target": 0.75}
    for scen in ("measured", "streaming_floor"):
        e2 = dict(model[scen]["two_hosts_16chips"])
        conclusion[scen + "_compute"] = e2
    _m = conclusion["measured_compute"]
    _f = conclusion["streaming_floor_compute"]
    conclusion["summary"] = (
        f"2 hosts x 8 chips: with measured v5e compute plain CG sits at "
        f"{_m['eff_cg']:.2f} ({'clears' if _m['eff_cg'] >= 0.75 else 'misses'} "
        f"the 0.75 target; the round-5 driver speedup cut per-iteration "
        f"compute ~2.3x, so the 2-psum latency now shows), pipelined CG "
        f"reaches {_m['eff_cg_pipelined_no_overlap']:.2f} without overlap / "
        f"{_m['eff_cg_pipelined_full_overlap']:.2f} with psum-matvec overlap "
        f"and block CG k=4 {_m['eff_cg_block_k4']:.2f}; at the adversarial "
        f"streaming floor plain CG fails ({_f['eff_cg']:.2f}) and the target "
        f"is met via pipelined CG ({_f['eff_cg_pipelined_no_overlap']:.2f} "
        f"no-overlap / {_f['eff_cg_pipelined_full_overlap']:.2f} overlapped) "
        f"or block CG k=4 ({_f['eff_cg_block_k4']:.2f})."
    )
    result = {
        "metric": "weak_scaling_virtual_mesh",
        "backend": "cpu-virtual-devices",
        "rows_per_device": args.rows_per_device,
        "iters": args.iters,
        "ny": args.ny,
        "conclusion_2hosts_16chips": conclusion,
        "curve": curves[("cg", "grid")],
        "curve_pipelined": curves[("cg_pipelined", "grid")],
        "curve_csr_pet": curves[("cg", "csr_pet")],
        "curve_bsr": curves[("cg", "bsr")],
        "block_cg_point": blk,
        # model for the BASELINE per-device problem (4.2M rows/device)
        "tpu_model_rows_per_device": 1 << 22,
        "tpu_model": model,
        "note": (
            "Virtual-mesh curves exercise the real shard_map/psum/ppermute "
            "path without ICI hardware (CPU-contention proxy: absolute "
            "efficiencies understate hardware; the CG-vs-pipelined gap is "
            "real, it counts synchronization points).  The tpu_model "
            "section predicts ICI/DCN-backed efficiency at 4/8/16 chips "
            "and at 2 hosts against the >=75% target."
        ),
    }
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
