"""Relocalization: BoW place recognition + guided pose recovery.

Capability EXTENSION over the reference: gmmloc has DBoW2 in-tree but no
keyframe database — a tracking failure terminates the run
(ref: gmmloc.cpp:157-159; SURVEY.md §5.3 flags this as the stress-config
extension). Pipeline: query the inverted-index database -> per candidate:
mutual-best Hamming matching to the KF's landmarks -> pose-only solve
seeded at the candidate KF pose -> accept on inlier count.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..features import matching
from ..geometry import camera as cam_mod
from ..mapping.map_state import MapState
from ..solver import pose_solver
from ..utils.fetch import fetch
from ..vocab.bow import KeyFrameDatabase, Vocabulary
from .frame import Frame


class Relocalizer:
    def __init__(
        self,
        cfg: SystemConfig,
        cam: cam_mod.CameraParams,
        world: MapState,
        voc: Vocabulary,
        min_inliers: int = 30,
        gmm_views: Optional[dict] = None,
        gmap=None,
        gmm_consistency_min: float = 0.25,
    ):
        self.cfg = cfg
        self.cam = cam
        self.world = world
        self.db = KeyFrameDatabase(voc)
        self.min_inliers = min_inliers
        # prior-map consistency check for recovered poses: the keyframe
        # database can contain drift-corrupted keyframes (a slipped run
        # keeps inserting), so inlier count alone accepted poses metres
        # off. The prior GMM is globally fixed — require a minimum
        # fraction of the frame's stereo points to be Mahalanobis-
        # consistent with their nearest component at the recovered pose.
        self.gmm_views = gmm_views
        self.gmap = gmap
        self.gmm_consistency_min = gmm_consistency_min
        pyr = world.pyr
        self.sigma2_inv = pyr["sigma2_inv"]
        self.last_stats: list = []  # per-candidate (kf, n_match, n_inlier)

    def _gmm_consistent(self, frame: Frame, q_cw, t_cw) -> bool:
        if self.gmap is None or self.gmm_views is None:
            return True
        from ..gmm import render as render_mod
        from ..mapping import map_state as ms

        sel = np.where(frame.valid & (frame.depth > 0))[0]
        if len(sel) < 20:
            return True  # not enough stereo evidence to judge
        if len(sel) > 512:
            sel = sel[:: len(sel) // 512 + 1]
        z = frame.depth[sel]
        uv = frame.uv[sel]
        pc = np.stack(
            [
                (uv[:, 0] - self.cam.cx) / self.cam.fx * z,
                (uv[:, 1] - self.cam.cy) / self.cam.fy * z,
                z,
            ],
            -1,
        )
        q_wc, t_wc = ms._inverse(q_cw, t_cw)
        pw = pc @ ms._quat_to_mat(q_wc).T + t_wc
        nearest = fetch(
            render_mod.query_point_3d(
                self.gmap, jnp.array(pw, jnp.float32), jnp.ones(len(pw), bool)
            )
        )
        k = np.maximum(nearest, 0)
        d = pw - self.gmm_views["means"][k]
        chi2 = np.einsum("ni,nij,nj->n", d, self.gmm_views["cov_inv"][k], d)
        frac = float((chi2 < 16.0).mean())
        self.last_stats.append(("gmm_frac", round(frac, 3)))
        return frac >= self.gmm_consistency_min

    def add_keyframe(self, kf: int) -> None:
        w = self.world
        self.db.add(kf, w.kf_feat_desc[kf], w.kf_feat_valid[kf])

    def remove_keyframe(self, kf: int) -> None:
        self.db.remove(kf)

    def relocalize(self, frame: Frame) -> bool:
        """Try to recover the frame pose from the map. Returns success."""
        w = self.world
        self.last_stats = []
        cands = self.db.query(frame.desc, frame.valid, top=5)
        for kf, score in cands:
            if not w.kf_valid[kf]:
                continue
            match, _ = matching.mutual_best_match(
                jnp.array(frame.desc),
                jnp.array(frame.valid),
                jnp.array(w.kf_feat_desc[kf]),
                jnp.array(w.kf_feat_valid[kf] & (w.kf_obs_point[kf] >= 0)),
                max_dist=matching.TH_LOW,
            )
            match = fetch(match)
            frame.mappoint[:] = -1
            mi = np.where(match >= 0)[0]
            p = w.kf_obs_point[kf, match[mi]]
            okm = (p >= 0) & w.pt_valid[np.maximum(p, 0)]
            frame.mappoint[mi[okm]] = p[okm]
            n = int(okm.sum())
            if n < 15:
                self.last_stats.append((int(kf), n, -1))
                continue
            frame.set_pose(w.kf_q[kf], w.kf_t[kf])

            has_pt = frame.mappoint >= 0
            x_w = np.zeros((frame.feat_cap, 3), np.float32)
            idx = np.where(has_pt)[0]
            x_w[idx] = w.pt_pos[frame.mappoint[idx]]
            obs = np.concatenate([frame.uv, frame.ur[:, None]], -1)
            res = pose_solver.optimize_pose(
                self.cam,
                jnp.array(frame.q_cw, jnp.float32),
                jnp.array(frame.t_cw, jnp.float32),
                jnp.array(x_w),
                jnp.array(obs, jnp.float32),
                jnp.array(frame.ur >= 0),
                jnp.array(self.sigma2_inv[frame.octave], jnp.float32),
                jnp.array(has_pt & frame.valid),
            )
            q_new, t_new, n_inl, is_out = fetch(
                (res.q, res.t, res.num_inliers, res.is_outlier)
            )
            q_new = q_new.astype(np.float64)
            t_new = t_new.astype(np.float64)
            pose_ok = bool(np.isfinite(q_new).all() and np.isfinite(t_new).all())
            self.last_stats.append((int(kf), n, int(n_inl)))
            if pose_ok and int(n_inl) >= self.min_inliers:
                if not self._gmm_consistent(frame, q_new, t_new):
                    continue
                frame.set_pose(q_new, t_new)
                frame.is_outlier = is_out.copy()
                for i in np.where(frame.mappoint >= 0)[0]:
                    if frame.is_outlier[i]:
                        frame.mappoint[i] = -1
                        frame.is_outlier[i] = False
                frame.ref_kf = kf
                return True
        return False
