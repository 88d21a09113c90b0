"""Loop closing: BoW candidate detection + 3D-3D closure + pose-graph fix.

Capability extension (BASELINE.json "pose-graph backend for loop
closure"; the reference terminates on tracking loss and never closes
loops). Pipeline:

  1. candidate detection: keyframe database query, excluding the current
     covisible neighborhood, with a minimum-similarity gate;
  2. geometric verification: mutual-best descriptor matches between the
     two keyframes' landmarks -> Umeyama 3D-3D alignment with inlier
     consensus -> relative pose measurement;
  3. correction: build a pose graph (odometry edges from covisibility,
     loop edge from step 2), optimize (solver/pose_graph.py), write
     keyframe poses back, and propagate the correction to landmarks via
     their reference keyframes.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..eval.ate import umeyama_alignment
from ..features import matching
from ..mapping import map_state as ms
from ..solver import pose_graph as pg
from ..vocab.bow import KeyFrameDatabase


class LoopCloser:
    def __init__(self, cfg: SystemConfig, world: ms.MapState,
                 db: KeyFrameDatabase, min_score: float = 0.05,
                 min_inliers: int = 20):
        self.cfg = cfg
        self.world = world
        self.db = db
        self.min_score = min_score
        self.min_inliers = min_inliers
        self.closures: List[Tuple[int, int]] = []

    # ------------------------------------------------------------------

    def detect(self, kf: int) -> Optional[Tuple[int, float]]:
        """Best loop candidate for kf outside its covisible neighborhood."""
        w = self.world
        neighborhood = set(int(k) for k in w.best_covisible(kf)) | {kf}
        cands = self.db.query(w.kf_feat_desc[kf], w.kf_feat_valid[kf], top=10)
        for cand, score in cands:
            if cand in neighborhood or not w.kf_valid[cand]:
                continue
            # temporal separation: require a real revisit, not a neighbor
            if abs(int(w.kf_frame_idx[kf]) - int(w.kf_frame_idx[cand])) < 3 * self.cfg.camera.fps:
                continue
            if score >= self.min_score:
                return cand, score
        return None

    def verify(self, kf_a: int, kf_b: int):
        """3D-3D consensus alignment between the KFs' landmark sets.

        Returns (q_ab, t_ab, n_inliers) with T_ab = T_a_w * T_w_b measured,
        or None.
        """
        w = self.world
        match, _ = matching.mutual_best_match(
            jnp.array(w.kf_feat_desc[kf_a]),
            jnp.array(w.kf_feat_valid[kf_a] & (w.kf_obs_point[kf_a] >= 0)),
            jnp.array(w.kf_feat_desc[kf_b]),
            jnp.array(w.kf_feat_valid[kf_b] & (w.kf_obs_point[kf_b] >= 0)),
            max_dist=matching.TH_LOW,
        )
        match = np.asarray(match)
        pa, pb = [], []
        for i in np.where(match >= 0)[0]:
            p1 = w.kf_obs_point[kf_a, i]
            p2 = w.kf_obs_point[kf_b, match[i]]
            if p1 >= 0 and p2 >= 0 and w.pt_valid[p1] and w.pt_valid[p2]:
                pa.append(w.pt_pos[p1])
                pb.append(w.pt_pos[p2])
        if len(pa) < self.min_inliers:
            return None
        pa = np.array(pa).T
        pb = np.array(pb).T
        # both point sets live in the same (drifted) world frame; a loop
        # appears as a rigid offset between the corresponded sets.
        r, t, _ = umeyama_alignment(pb, pa, with_scale=False)
        resid = np.linalg.norm((r @ pb + t[:, None]) - pa, axis=0)
        inliers = resid < 0.25
        if inliers.sum() < self.min_inliers:
            return None
        r, t, _ = umeyama_alignment(pb[:, inliers], pa[:, inliers], with_scale=False)
        # world-frame correction W' = (r, t); convert to a relative pose
        # measurement between the two keyframes:
        # T_a_w_corr = T_a_w ; T_ab_meas = T_a_w * corr * T_w_b
        Ra = ms._quat_to_mat(w.kf_q[kf_a])
        Rb = ms._quat_to_mat(w.kf_q[kf_b])
        T_a = np.eye(4)
        T_a[:3, :3], T_a[:3, 3] = Ra, w.kf_t[kf_a]
        T_corr = np.eye(4)
        T_corr[:3, :3], T_corr[:3, 3] = r, t
        T_b_inv = np.eye(4)
        T_b_inv[:3, :3], T_b_inv[:3, 3] = Rb.T, -Rb.T @ w.kf_t[kf_b]
        T_ab = T_a @ T_corr @ T_b_inv
        from ..geometry import se3 as jse3

        q_ab = np.asarray(jse3.matrix_to_quat(jnp.array(T_ab[:3, :3])))
        return q_ab, T_ab[:3, 3], int(inliers.sum())

    # ------------------------------------------------------------------

    def close(self, kf: int) -> bool:
        """Detect + verify + correct. Returns True if a loop was closed."""
        w = self.world
        det = self.detect(kf)
        if det is None:
            return False
        cand, score = det
        ver = self.verify(kf, cand)
        if ver is None:
            return False
        q_loop, t_loop, n_in = ver

        kfs = [int(k) for k in np.where(w.kf_valid)[0]]
        slot = {k: i for i, k in enumerate(kfs)}
        N = len(kfs)
        q = jnp.array(w.kf_q[kfs], jnp.float32)
        t = jnp.array(w.kf_t[kfs], jnp.float32)

        edge_i, edge_j, eq, et, info = [], [], [], [], []
        # covisibility odometry edges (current relative poses)
        for a in kfs:
            for b in w.best_covisible(a, 5):
                b = int(b)
                if b <= a or b not in slot:
                    continue
                dq, dt = ms._compose(
                    w.kf_q[a], w.kf_t[a], *ms._inverse(w.kf_q[b], w.kf_t[b])
                )
                edge_i.append(slot[a])
                edge_j.append(slot[b])
                eq.append(dq)
                et.append(dt)
                info.append(np.full(6, 100.0))
        # the loop edge
        edge_i.append(slot[kf])
        edge_j.append(slot[cand])
        eq.append(q_loop)
        et.append(t_loop)
        info.append(np.full(6, 400.0))

        E = len(edge_i)
        fixed = np.zeros(N, bool)
        fixed[slot[kfs[0]]] = True
        g = pg.PoseGraph(
            q=q, t=t,
            valid=jnp.ones(N, bool),
            fixed=jnp.array(fixed),
            edge_i=jnp.array(edge_i, jnp.int32),
            edge_j=jnp.array(edge_j, jnp.int32),
            edge_q=jnp.array(np.stack(eq), jnp.float32),
            edge_t=jnp.array(np.stack(et), jnp.float32),
            edge_info=jnp.array(np.stack(info), jnp.float32),
            edge_valid=jnp.ones(E, bool),
        )
        q_new, t_new, cost = pg.optimize_pose_graph(g, iters=15)
        q_new = np.asarray(q_new, np.float64)
        t_new = np.asarray(t_new, np.float64)

        # write back + propagate landmarks via their reference keyframes:
        # x' = T_w_ref_new * (T_ref_w_old x)
        old_q = {k: w.kf_q[k].copy() for k in kfs}
        old_t = {k: w.kf_t[k].copy() for k in kfs}
        for k in kfs:
            i = slot[k]
            nq = q_new[i] / np.linalg.norm(q_new[i])
            w.kf_q[k], w.kf_t[k] = nq, t_new[i]

        pts = np.where(w.pt_valid)[0]
        refs = w.pt_ref_kf[pts]
        for k in kfs:
            sel = pts[refs == k]
            if len(sel) == 0:
                continue
            R_old = ms._quat_to_mat(old_q[k])
            R_new = ms._quat_to_mat(w.kf_q[k])
            # x_cam = R_old x + t_old ; x' = R_new^T (x_cam - t_new)
            x_cam = w.pt_pos[sel] @ R_old.T + old_t[k]
            w.pt_pos[sel] = (x_cam - w.kf_t[k]) @ R_new
            w.dirty_pt.update(sel.tolist())
        w.map_version += 1  # poses/points moved in place (cache tokens)
        self.closures.append((kf, cand))
        return True
