"""End-to-end synthetic run: full system on a GT trajectory segment.

Usage: python tools/run_synthetic.py [n_frames] [stride] [seq] [start]
(default start=150 skips the stationary, depth-degenerate opening of the
V1/V2 sequences — see README deliberate deviations.)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from gmmloc_tpu.utils.tpuenv import ensure_fast_tpu_env

ensure_fast_tpu_env()

import jax

if "cpu" in str(jax.devices()).lower() or True:
    pass  # platform chosen by env / sitecustomize

import numpy as np

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import ate, synthetic
from gmmloc_tpu.pipeline.system import GMMLocSystem


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    seq = sys.argv[3] if len(sys.argv) > 3 else "V1_01_easy"
    start = int(sys.argv[4]) if len(sys.argv) > 4 else 150

    import dataclasses

    cfg = euroc_v1_config()
    cfg = cfg.replace(
        tracking=dataclasses.replace(cfg.tracking, velocity_damping=0.9)
    )
    fe, ts, q_wc, t_wc = synthetic.make_sequence(
        cfg,
        gt_path=f"{synthetic.GT_DIR}/{seq}.txt",
        n_frames=start + n_frames,
        stride=stride,
        n_landmarks=30000,
        disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1,
    )
    ts, q_wc, t_wc = ts[start:], q_wc[start:], t_wc[start:]
    sys_ = GMMLocSystem(cfg, fe_gmap(cfg))

    t0 = time.time()
    frames = []
    stats = []

    from gmmloc_tpu.utils.control import control as ctl, install_signal_handlers

    install_signal_handlers()  # SIGUSR1 pause / SIGUSR2 step / SIGTERM stop
    for i in range(len(ts)):
        while not ctl.should_run() and not ctl.stop:
            time.sleep(0.001)
        ctl.consume_step()
        if ctl.stop:
            print(f"stop requested at frame {i}")
            break
        frame = fe.make_frame(i, ts[i], q_wc[i], t_wc[i])
        stat = sys_.step(frame, q_wc[i], t_wc[i])
        if stat is not None:  # pipelined mode: stat belongs to prev frame
            stats.append(stat)
        if sys_.track_failed:
            print(f"TRACKING FAILED at frame {i}")
            break
        if i % 20 == 0:
            print(
                f"frame {i:4d} inliers={stat.num_match_inliers:4d} "
                f"ratio={stat.ratio_map:.2f} kfs={sys_.world.n_keyframes()} "
                f"pts={sys_.world.n_points()} t={time.time()-t0:.1f}s"
            )
    st = sys_.flush()  # final in-flight frame (pipelined mode)
    if st is not None:
        stats.append(st)
    wall = time.time() - t0
    n_done = len(stats)
    print(f"\n{n_done} frames in {wall:.1f}s = {n_done/wall:.2f} fps")

    ts_est, q_est, t_est = sys_.export_trajectory()
    m = ate.ate_rmse(ts_est, t_est, ts[:n_done], t_wc[:n_done])
    print(f"ATE: rmse={m['rmse']*100:.2f}cm mean={m['mean']*100:.2f}cm n={m['n']}")


def fe_gmap(cfg):
    from gmmloc_tpu.gmm import mixture
    return mixture.load(
        synthetic.V1_GMM,
        pad_to=cfg.caps.gmm_components_pad,
        neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
        neighbor_cap=cfg.gmm.neighbor_cap,
    )


if __name__ == "__main__":
    main()
