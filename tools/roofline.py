"""Speed-of-light accounting for the two flagship kernels (VERDICT r2 #6).

Replaces the reference's compute kernel (localization_opt.cpp:456 g2o
solve; tracking_opt.cpp pose opt) with measured rooflines:

- FLOP / byte counts: XLA cost analysis of the EXACT jitted computations
  — `__graft_entry__.entry()`'s fused per-frame track step at production
  caps, and `solve_local_ba` at the production BA window (L=16, C=48,
  P=8192, MO=ba_obs_per_point, bf16 staging, 5/5/40 LM iterations ==
  cfg.loc.ba_iters_*). Runs on the CPU backend so it is safe while the
  real chip is busy; HLO flop counts are algorithmic (backend-independent
  up to fusion algebra), while "bytes accessed" reflects the CPU
  lowering's buffer assignment — treat bandwidth rows as estimates.

- Measured times: bench.py's two-point-slope on-chip timings, which
  cancel the dev tunnel's dispatch latency (BENCH_r02 detail:
  fused_track_step 9.19 ms, local_ba 54.57 ms; in-situ floor confirmed
  by expr_prof/step_profile_r3_tpu_devworld4.json loc/ba min 53.1 ms).
  Override with --track_ms / --ba_ms after a fresh bench run.

- Peaks (TPU v5e, the "TPU v5 lite" device in this environment): 197
  TFLOP/s bf16 MXU, 819 GB/s HBM => ridge point ~240 FLOP/byte.

Usage:
  python tools/roofline.py [--track_ms 9.19] [--ba_ms 54.57]
                           [--out expr_prof/roofline_r3.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PEAK_FLOPS_BF16 = 197e12  # TPU v5e MXU, bf16 with f32 accumulate
PEAK_HBM_BPS = 819e9      # TPU v5e HBM bandwidth


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _roofline(name, flops, byts, ms):
    t = ms * 1e-3
    t_flops = flops / PEAK_FLOPS_BF16
    t_bytes = byts / PEAK_HBM_BPS
    sol = max(t_flops, t_bytes)
    ai = flops / max(byts, 1.0)
    return {
        "kernel": name,
        "flops": flops,
        "bytes_accessed": byts,
        "arithmetic_intensity_flop_per_byte": round(ai, 2),
        "measured_ms": ms,
        "achieved_gflops": round(flops / t / 1e9, 1),
        "achieved_gbps": round(byts / t / 1e9, 1),
        "pct_of_flops_peak": round(100.0 * flops / t / PEAK_FLOPS_BF16, 3),
        "pct_of_hbm_peak": round(100.0 * byts / t / PEAK_HBM_BPS, 2),
        "speed_of_light_ms": round(sol * 1e3, 4),
        "pct_of_speed_of_light": round(100.0 * sol / t, 2),
        "bound": "compute" if t_flops > t_bytes else "memory",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track_ms", type=float, default=9.19,
                    help="on-chip fused track step (BENCH detail)")
    ap.add_argument("--ba_ms", type=float, default=54.57,
                    help="on-chip production-window BA solve (BENCH detail)")
    ap.add_argument("--out", default="expr_prof/roofline_r3.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    # ---- kernel 1: fused per-frame track step (flagship entry) --------
    import __graft_entry__ as g

    fn, ex = g.entry()
    track_flops, track_bytes = _cost(jax.jit(fn).lower(*ex).compile())

    # ---- kernel 2: production local-BA window solve -------------------
    from ba_bench import build  # tools/ba_bench.py

    from gmmloc_tpu.config import euroc_v1_config
    from gmmloc_tpu.geometry import camera as cam_mod
    from gmmloc_tpu.solver import local_ba

    cfg = euroc_v1_config()
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    L, C, P, MO = 16, 48, 8192, cfg.caps.ba_obs_per_point
    prob = build(np.random.default_rng(0), cam, L, C, P, MO)

    def ba(prob):
        return local_ba.solve_local_ba(
            cam, prob, n_free=L,
            iters1=cfg.loc.ba_iters_stage1, iters2=cfg.loc.ba_iters_stage2,
            iters3=cfg.loc.ba_iters_stage3, use_bf16=True,
        )

    ba_flops, ba_bytes = _cost(jax.jit(ba).lower(prob).compile())

    rows = [
        _roofline("fused_track_step", track_flops, track_bytes,
                  args.track_ms),
        _roofline(f"local_ba L={L} C={C} P={P} MO={MO} (5/5/40 LM)",
                  ba_flops, ba_bytes, args.ba_ms),
    ]
    out = {
        "peaks": {"flops_bf16": PEAK_FLOPS_BF16, "hbm_bps": PEAK_HBM_BPS,
                  "device": "TPU v5e (v5 lite)"},
        "method": "XLA cost_analysis on CPU lowering (algorithmic HLO "
                  "flops; bytes are a lowering estimate) x bench.py "
                  "two-point-slope on-chip times",
        "kernels": rows,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for r in rows:
        print(json.dumps(r))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
