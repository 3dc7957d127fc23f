"""Weak-scaling curve on a VIRTUAL device mesh (committed evidence).

Real multi-host hardware is not available in this environment, so this
driver produces the committable part of the BASELINE weak-scaling evidence:

1. an empirical 1/2/4/8-device weak-scaling curve on the CPU virtual mesh
   (``xla_force_host_platform_device_count``) -- this exercises the REAL
   sharded code path (halo ppermutes + psum reductions inside the
   shard_map'd while_loop), just not real ICI links;
2. an analytic communication-volume model for the same solve on TPU
   hardware, predicting multi-host efficiency against the >=75% target.

Usage::

    python tools/weak_scaling_virtual.py --out WEAKSCALE.json

Per-iteration communication of the sharded 5-point-grid CG (see
krylov_tpu/parallel/grid.py + solve.py):

* halo exchange: 2 neighbor messages of ``h * ny`` words (h = stencil halo
  width, 1 here) in each direction -> ``2 * ny * 4`` bytes per device pair,
* reductions: 2 scalar ``psum`` allreduces (pAp and rho), latency-bound.

Per-iteration compute per device streams ~7 words/row (5 coefficients +
x + y) at HBM speed.  Model: eff = t_comp / (t_comp + t_halo + t_psum).
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(n_dev, rows_per_dev, iters, ny):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "weak_scaling.py"),
            "--rows-per-device", str(rows_per_dev),
            "--iters", str(iters),
            "--ny", str(ny),
            "--virtual-devices", str(n_dev),
        ],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def tpu_comm_model(rows_per_dev, ny, hbm_gbps=819.0, ici_gbps=45.0,
                   dcn_gbps=25.0, psum_lat_ici_us=3.0, psum_lat_dcn_us=25.0):
    """Predicted weak-scaling efficiency of one CG iteration on TPU."""
    t_comp = 7 * rows_per_dev * 4 / (hbm_gbps * 1e9)
    halo_bytes = 2 * ny * 4
    model = {}
    for name, bw, lat in (
        ("ici", ici_gbps, psum_lat_ici_us),
        ("dcn", dcn_gbps, psum_lat_dcn_us),
    ):
        t_halo = halo_bytes / (bw * 1e9) + lat * 1e-6  # 1 neighbor exchange
        t_psum = 2 * lat * 1e-6                        # 2 scalar allreduces
        model[name] = {
            "t_comp_us": round(t_comp * 1e6, 2),
            "t_halo_us": round(t_halo * 1e6, 2),
            "t_psum_us": round(t_psum * 1e6, 2),
            "predicted_efficiency": round(
                t_comp / (t_comp + t_halo + t_psum), 4
            ),
        }
    return model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows-per-device", type=int, default=1 << 20)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--ny", type=int, default=1024)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    curve = []
    for n in args.devices:
        r = run_one(n, args.rows_per_device, args.iters, args.ny)
        curve.append(r)
        print(json.dumps(r), flush=True)

    base = curve[0]["nnz_per_s_per_device"]
    for r in curve:
        r["efficiency_vs_1dev"] = round(r["nnz_per_s_per_device"] / base, 4)

    result = {
        "metric": "weak_scaling_virtual_mesh",
        "backend": "cpu-virtual-devices",
        "rows_per_device": args.rows_per_device,
        "iters": args.iters,
        "ny": args.ny,
        "curve": curve,
        # model for the same per-device problem at TPU scale (BASELINE
        # config: 4.2M rows/device)
        "tpu_model_rows_per_device": 1 << 22,
        "tpu_comm_model": tpu_comm_model(1 << 22, 4096),
        "note": (
            "Virtual-mesh curve exercises the real shard_map/psum/ppermute "
            "path without ICI hardware; the analytic model predicts "
            "hardware efficiency vs the >=75% BASELINE target."
        ),
    }
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
