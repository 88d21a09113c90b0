"""Image-path smoke: sprite-rendered stereo -> ORB front-end -> system.

Exercises the FULL pipeline including the image front-end (the
feature-level harness bypasses it). Usage:
  python tools/run_image_pipeline.py [n_frames] [start]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmloc_tpu.utils.tpuenv import ensure_fast_tpu_env

ensure_fast_tpu_env()

import numpy as np

import dataclasses

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.eval.image_synthetic import SpriteRenderer
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.mapping.map_state import _inverse
from gmmloc_tpu.pipeline.frontend import ImageFrontend
from gmmloc_tpu.pipeline.system import GMMLocSystem


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    cfg = euroc_v1_config()
    cfg = cfg.replace(
        camera=dataclasses.replace(cfg.camera, do_rectify=False, do_equalization=False),
        tracking=dataclasses.replace(cfg.tracking, velocity_damping=0.9),
    )
    ts, q_wc, t_wc = synthetic.load_gt_trajectory(
        f"{synthetic.GT_DIR}/V1_01_easy.txt"
    )
    from gmmloc_tpu.utils import proto

    means, covs, _, _ = proto.load_gmm_file(synthetic.V1_GMM)
    world = synthetic.sample_world_from_gmm(means, covs, n_landmarks=9000)
    renderer = SpriteRenderer(world, cfg)
    frontend = ImageFrontend(cfg)
    gmap = mixture.load(
        synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
        neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
        neighbor_cap=cfg.gmm.neighbor_cap,
    )
    sys_ = GMMLocSystem(cfg, gmap)

    t0 = time.time()
    frames = []
    for i in range(n_frames):
        fi = start + i
        left, right = renderer.render_stereo(q_wc[fi], t_wc[fi])
        left = np.clip(np.round(left), 0, 255).astype(np.uint8)
        right = np.clip(np.round(right), 0, 255).astype(np.uint8)
        frame = frontend.process_packed(i, ts[fi], left, right)
        n_depth = int((frame.depth > 0).sum())
        # pipelined default: stat belongs to the PREVIOUS frame (None
        # while the first is in flight); final poses land at drain time
        st = sys_.step(frame, q_wc[fi], t_wc[fi])
        frames.append((fi, frame))
        print(
            f"f{i}: feats={frame.num_features()} stereo={n_depth} "
            f"inl={st.num_match_inliers if st is not None else '-'} "
            f"kfs={sys_.world.n_keyframes()} pts={sys_.world.n_points()}",
            flush=True,
        )
        if sys_.track_failed or (st is not None and not st.res):
            print("TRACKING FAILED")
            break
    sys_.flush()
    errs = []
    for fi, frame in frames:
        _, ti = _inverse(frame.q_cw, frame.t_cw)
        errs.append(np.linalg.norm(ti - t_wc[fi]))
    wall = time.time() - t0
    print(f"\n{len(errs)} frames in {wall:.0f}s; max err {max(errs)*1000:.1f}mm")


if __name__ == "__main__":
    main()
