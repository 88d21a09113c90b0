"""Checkpoint/resume round-trip tests."""

import numpy as np

from gmmloc_tpu.pipeline import checkpoint
from tests.test_world_model import make_test_frame, small_cfg

from gmmloc_tpu.mapping import map_state as ms


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    w = ms.MapState(cfg)
    kf0 = w.alloc_keyframe(make_test_frame(0))
    kf1 = w.alloc_keyframe(make_test_frame(1))
    for i in range(20):
        p = w.alloc_point([i, 0.0, 5.0], kf0, 0)
        w.add_observation(p, kf0, i)
        w.add_observation(p, kf1, i)
    w.update_connections(kf0)
    fr = make_test_frame(2)
    fr.ref_kf = kf0
    w.update_frame_info(fr)

    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(path, w, frame_cursor=3, extra={"seq": "V1"})

    w2 = ms.MapState(cfg)
    cursor, extra = checkpoint.load_checkpoint(path, w2)
    assert cursor == 3 and extra["seq"] == "V1"
    np.testing.assert_array_equal(w.kf_obs_point, w2.kf_obs_point)
    np.testing.assert_array_equal(w.pt_pos, w2.pt_pos)
    np.testing.assert_array_equal(w.covis, w2.covis)
    assert w._kf_order == w2._kf_order
    assert len(w2.frame_infos) == 1
    w2.check_invariants()
    # trajectories identical
    t1 = w.export_trajectory()
    t2 = w2.export_trajectory()
    np.testing.assert_allclose(t1[2], t2[2])
