"""Run checkpoint / resume for long evaluation sweeps.

The reference persists nothing mid-run (SURVEY.md §5.4 — only the GMM map
at startup and the trajectory at shutdown). For long sweeps this module
snapshots the full world state + orchestrator cursor so a run can resume
after preemption. Format: a single .npz (all MapState arrays are already
struct-of-arrays numpy) + a small JSON side record.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np

from ..mapping.map_state import FrameInfo, MapState

_ARRAY_FIELDS = [
    "kf_valid", "kf_q", "kf_t", "kf_frame_idx", "kf_timestamp",
    "kf_feat_uv", "kf_feat_ur", "kf_feat_depth", "kf_feat_octave",
    "kf_feat_angle", "kf_feat_desc", "kf_feat_valid", "kf_obs_point",
    "kf_comp_cand", "covis", "covis_link",
    "pt_valid", "pt_pos", "pt_normal", "pt_min_dist", "pt_max_dist",
    "pt_desc", "pt_ref_kf", "pt_created_kf_idx", "pt_num_found",
    "pt_num_visible", "pt_n_obs", "pt_obs_kf", "pt_obs_feat",
    "pt_assoc_comp", "pt_type", "pt_replaced_by", "pt_last_visible_idx",
    "pt_fuse_tgt_kf",
]

FORMAT_VERSION = 1


def save_checkpoint(path: str, world: MapState, frame_cursor: int,
                    extra: Optional[dict] = None) -> None:
    arrays = {f: getattr(world, f) for f in _ARRAY_FIELDS}
    arrays["_free_kf"] = np.array(world._free_kf, np.int64)
    arrays["_free_pt"] = np.array(world._free_pt, np.int64)
    arrays["_kf_order"] = np.array(world._kf_order, np.int64)
    arrays["fi_ts"] = np.array([fi.timestamp for fi in world.frame_infos])
    arrays["fi_ref"] = np.array(
        [fi.ref_kf for fi in world.frame_infos], np.int64
    )
    arrays["fi_q"] = (
        np.stack([fi.q_cr for fi in world.frame_infos])
        if world.frame_infos else np.zeros((0, 4))
    )
    arrays["fi_t"] = (
        np.stack([fi.t_cr for fi in world.frame_infos])
        if world.frame_infos else np.zeros((0, 3))
    )
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    meta = {
        "version": FORMAT_VERSION,
        "frame_cursor": int(frame_cursor),
        "max_kf_frame_idx": int(world.max_kf_frame_idx),
        "extra": extra or {},
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, world: MapState) -> Tuple[int, dict]:
    """Restore into an already-constructed (same-capacity) MapState.
    Returns (frame_cursor, extra)."""
    z = np.load(path)
    for f in _ARRAY_FIELDS:
        tgt = getattr(world, f)
        src = z[f]
        assert tgt.shape == src.shape, (f, tgt.shape, src.shape)
        tgt[...] = src
    world._free_kf = list(z["_free_kf"])
    world._free_pt = list(z["_free_pt"])
    world._kf_order = [int(x) for x in z["_kf_order"]]
    world.frame_infos = [
        FrameInfo(float(t), int(r), q, tt)
        for t, r, q, tt in zip(z["fi_ts"], z["fi_ref"], z["fi_q"], z["fi_t"])
    ]
    with open(path + ".json") as f:
        meta = json.load(f)
    assert meta["version"] == FORMAT_VERSION
    world.max_kf_frame_idx = meta["max_kf_frame_idx"]
    # the DeviceWorld mirror (if any) is entirely stale after a restore:
    # mark every live row dirty so the next sync() re-scatters it
    world.dirty_kf.update(np.where(world.kf_valid)[0].tolist())
    world.dirty_pt.update(np.where(world.pt_valid)[0].tolist())
    world.map_version += 1
    return meta["frame_cursor"], meta.get("extra", {})
