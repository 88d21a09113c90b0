"""LOST-state relocalization: the system survives a tracking blackout.

Capability extension over the reference, which terminates the run on
tracking failure (ref: gmmloc.cpp:157-159; SURVEY.md §5.3). Here the
observation stream is blacked out for several frames (total detection
dropout) and the system must enter the LOST state, keep consuming
frames, relocalize via the BoW keyframe database once observations
resume, and finish the sequence with a sane trajectory.
"""

import dataclasses
import os

import numpy as np
import pytest

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import ate, synthetic
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.pipeline.system import GMMLocSystem
from gmmloc_tpu.vocab.bow import Vocabulary

HAVE_ASSETS = os.path.exists(synthetic.V1_GMM) and os.path.exists(
    f"{synthetic.GT_DIR}/V1_01_easy.txt"
)


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_lost_state_relocalization_recovers():
    cfg = euroc_v1_config()
    cfg = cfg.replace(
        tracking=dataclasses.replace(cfg.tracking, velocity_damping=0.9)
    )
    fe, ts, q_wc, t_wc = synthetic.make_sequence(
        cfg, n_frames=400, stride=1, n_landmarks=20000,
        disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1,
    )
    gmap = mixture.load(
        synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
        neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
        neighbor_cap=cfg.gmm.neighbor_cap,
    )
    voc = Vocabulary.train(fe.world.desc[::4], k=10, depth=3, seed=0)
    s = GMMLocSystem(cfg, gmap, vocabulary=voc)
    assert s.relocalizer is not None

    START, N = 150, 70
    BLACKOUT = range(40, 46)  # frames with zero true detections
    errs = []
    for i in range(N):
        fi = START + i
        if i in BLACKOUT:
            fe.drop_frac, saved = 1.0, fe.drop_frac
        f = fe.make_frame(i, ts[fi], q_wc[fi], t_wc[fi])
        if i in BLACKOUT:
            fe.drop_frac = saved
        st = s.step(f, q_wc[fi], t_wc[fi])
        assert not s.track_failed, f"fatal failure at {i}"
        if st.res and i > max(BLACKOUT):
            err = np.linalg.norm(
                -_rot(f.q_cw).T @ f.t_cw - t_wc[fi]
            )
            errs.append(err)

    assert s.n_lost > 0, "blackout never triggered the LOST state"
    assert not s.lost, "system did not relocalize after the blackout"
    assert len(errs) >= 10, "too few tracked frames after recovery"
    assert np.max(errs) < 0.10, f"post-recovery error {np.max(errs):.3f} m"

    # exported trajectory skips the lost frames but still scores
    ts_est, _, t_est = s.export_trajectory()
    m = ate.ate_rmse(ts_est, t_est, ts[START : START + N], t_wc[START : START + N])
    assert m["rmse"] < 0.05, m


def _rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
