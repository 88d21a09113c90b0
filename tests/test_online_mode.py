"""Online (threaded mapping) mode smoke test."""

import dataclasses
import os

import numpy as np
import pytest

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.mapping.map_state import _inverse
from gmmloc_tpu.pipeline.system import GMMLocSystem

HAVE_ASSETS = os.path.exists(synthetic.V1_GMM)


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_online_mode_tracks_and_maps():
    cfg = euroc_v1_config().replace(online=True)
    cfg = cfg.replace(
        tracking=dataclasses.replace(cfg.tracking, velocity_damping=0.9)
    )
    fe, ts, q_wc, t_wc = synthetic.make_sequence(
        cfg, n_frames=300, stride=1, n_landmarks=20000,
        disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1,
    )
    START, N = 150, 50
    gmap = mixture.load(
        synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
        neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
        neighbor_cap=cfg.gmm.neighbor_cap,
    )
    s = GMMLocSystem(cfg, gmap)
    assert s.online is not None
    errs = []
    for i in range(N):
        fi = START + i
        f = fe.make_frame(i, ts[fi], q_wc[fi], t_wc[fi])
        st = s.step(f, q_wc[fi], t_wc[fi])
        assert st is None or st.res, f"failed at {i}"
        qi, ti = _inverse(f.q_cw, f.t_cw)
        errs.append(np.linalg.norm(ti - t_wc[fi]))
    s.stop()  # drain the mapping thread
    assert s.localizer.is_finished
    assert max(errs) < 0.08, max(errs)
    # mapping thread processed the queue
    assert s.localizer.count_queue() == 0
    assert s.world.n_keyframes() >= 1
