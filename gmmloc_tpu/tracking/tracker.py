"""Per-frame tracking front-end.

TPU-native replacement for Tracking (ref:
/root/reference/gmmloc/src/modules/tracking.cpp, tracking_opt.cpp).
Pipeline per frame (tracking.cpp track:35-116):

  updateLastFrame -> createTemporalPoints -> trackWithMotionModel
  (guided projection search + staged pose-only solve) -> [fallback
  trackKeyFrame] -> updateLocalMap -> searchLocalPoints -> trackLocalMap
  (second pose solve) -> stats.

Host numpy orchestrates bookkeeping; the two hot stages per frame — the
guided matching (dense masked N x M Hamming pass) and the staged
pose-only GN — are jitted device kernels (features/matching.py,
solver/pose_solver.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..features import matching
from ..geometry import camera as cam_mod
from ..mapping.map_state import MapState, _inverse, _quat_to_mat
from ..solver import pose_solver
from ..utils.fetch import AsyncFetch, fetch, record_uploads
from ..utils.timing import Timer
from . import fused
from .frame import Frame


@dataclass
class TrackStat:
    """Ref: tracking.h:16-21."""

    res: bool = False
    num_match_inliers: int = 0
    ratio_map: float = 0.0


@dataclass
class FusedPending:
    """In-flight fused track step: the dispatch went out, the overlapped
    readback has been started, host bookkeeping is deferred until
    `Tracker.fused_complete` (pipelined mode: the wait overlaps the
    caller's next-frame work instead of blocking ~1 RTT per frame)."""

    frame: Frame
    fetch: AsyncFetch
    lp: np.ndarray      # local-map point ids aligned with kernel slots
    n_lp: int
    q_pred: np.ndarray  # constant-velocity prediction (plausibility gate)
    t_pred: np.ndarray
    packed: bool = False  # result is fused_track_step_packed's one vector
    chained: bool = False  # device-chained dispatch: prediction comes in
    # the output vector's +7 extension; last-frame prep (updateLastFrame
    # + temporal points) is deferred to drain time


class Tracker:
    def __init__(
        self,
        cfg: SystemConfig,
        cam: cam_mod.CameraParams,
        world: MapState,
        gmm_views: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.cam = cam
        self.world = world
        # host views of the prior GMM (means/normal/sqrt_info/is_degenerated)
        # for per-frame structure anchoring; None disables the anchor path
        self.gmm_views = gmm_views
        self.last_frame: Optional[Frame] = None
        self.ref_keyframe: int = -1
        self.local_keyframes: List[int] = []
        self.local_points: np.ndarray = np.zeros(0, np.int64)
        self.temp_points: List[int] = []
        self.stat = TrackStat()
        # per-frame debug counters (host-side, negligible cost): filled by
        # the track paths, consumed by tools/diagnose_seq.py
        self.dbg: dict = {}
        self._coast_streak = 0
        # device-resident upload cache for the packed fused path: static
        # tables (GMM geometry, pyramid scales) uploaded once; the current
        # frame's packed feature table is kept on-device and reused as the
        # next frame's last-frame input (utils/tpuenv transfer profile:
        # ~3 ms/array + ~38 ms/MB through the dev tunnel)
        self._dev: dict = {}
        # device-chained pipeline state (tracking/fused.py chained step):
        # refs to the last dispatch's device arrays; None = not primed
        self._chain: Optional[dict] = None
        self.dev_world = None       # set by the system (localizer's mirror)
        self.host_vel = None        # (vel_q, vel_t) set by system at prime
        pyr = world.pyr
        self.scale_factors = pyr["scale_factors"]
        self.sigma2_inv = pyr["sigma2_inv"]
        self.th_depth = pyr["th_depth"]
        self.log_sf = pyr["log_scale_factor"]
        self.num_levels = cfg.frame.num_levels

    # ------------------------------------------------------------------

    def initialize(self, frame: Frame) -> None:
        self.last_frame = frame
        self.ref_keyframe = frame.ref_kf
        self.local_keyframes = [frame.ref_kf]

    def track(self, frame: Frame) -> TrackStat:
        self.invalidate_chain()  # synchronous frame: device chain is stale
        if self.cfg.tracking.use_fused_track:
            st = self._track_fused(frame)
            if st is not None:
                return st
            # fall through to the classic path on fused failure; the fused
            # dispatch already ran the last-frame prep (temporal points)
            return self._track_classic(frame, prep=False)
        return self._track_classic(frame)

    def track_classic_fallback(self, frame: Frame) -> TrackStat:
        """Classic path for a frame whose fused dispatch under-matched —
        prep (updateLastFrame/temporal points) already ran at dispatch
        time, so skip it instead of allocating duplicate temporal
        landmarks (ADVICE r2 low, system.py drain fallback)."""
        self.invalidate_chain()
        return self._track_classic(frame, prep=False)

    def _track_classic(self, frame: Frame, prep: bool = True) -> TrackStat:
        w = self.world
        if prep:
            self._update_last_frame()
            if not self.last_frame.is_keyframe:
                self._create_temporal_points()

        self.stat = TrackStat(res=True)
        self.dbg = {"path": "classic"}
        with Timer("track/motion"):
            n = self._track_with_motion_model(frame)
        self.dbg["n_after_motion"] = n
        if n < self.cfg.tracking.min_matches_track:
            n = self._track_keyframe(frame)
            self.dbg["used_kf_fallback"] = True
            self.dbg["n_after_kf"] = n
            if n < self.cfg.tracking.min_matches_track:
                self.stat.res = False
                self.stat.num_match_inliers = 10
                self._cleanup(frame)
                return self.stat

        frame.ref_kf = self.ref_keyframe
        with Timer("track/local"):
            self._update_local_map(frame)
            self._search_local_points(frame)
            self.stat.num_match_inliers = self._track_local_map(frame)
        sel = frame.mappoint[frame.mappoint >= 0]
        self.dbg["n_gmm_inliers"] = int((w.pt_assoc_comp[sel] >= 0).sum())
        self._plausibility_gate(frame)

        # map-coverage ratio over near-depth features (tracking.cpp:86-103)
        near = (frame.depth > 0) & (frame.depth < self.th_depth) & frame.valid
        num_total = int(near.sum())
        sel = near & (frame.mappoint >= 0)
        num_map = int((w.pt_n_obs[frame.mappoint[sel]] > 0).sum())
        self.stat.ratio_map = num_map / max(1, num_total)

        self._cleanup(frame)
        self.last_frame = frame
        return self.stat

    # ------------------------------------------------------------------

    def _update_last_frame(self) -> None:
        """Swap replaced mappoints (tracking.cpp:397-408)."""
        f = self.world
        fr = self.last_frame
        has = fr.mappoint >= 0
        idx = np.where(has)[0]
        if len(idx):
            pts = fr.mappoint[idx].copy()
            rep = f.pt_replaced_by[pts]
            # follow one-step replacement chains (iterate a few times)
            for _ in range(4):
                follow = rep >= 0
                if not follow.any():
                    break
                pts[follow] = rep[follow]
                rep = f.pt_replaced_by[pts]
            pts[~f.pt_valid[pts]] = -1
            fr.mappoint[idx] = pts

    def _create_temporal_points(self) -> None:
        """Short-lived stereo landmarks from the last frame
        (tracking.cpp:411-470): nearest-depth first, up to 100 near points."""
        f = self.last_frame
        w = self.world
        zs = f.depth.copy()
        zs[~f.valid] = -1
        order = np.argsort(np.where(zs > 0, zs, np.inf))
        zo = zs[order]
        good = (zo > 0) & np.isfinite(zo)
        n_good = int(good.sum())          # depth-sorted prefix is contiguous
        if n_good == 0:
            return
        # cutoff (vectorized loop semantics): stop after the first
        # depth-sorted position j where z > th_depth and (j+1) > cap
        cap = self.cfg.tracking.temporal_points_cap
        stop = (zo[:n_good] > self.th_depth) & (np.arange(1, n_good + 1) > cap)
        n_proc = int(np.argmax(stop)) + 1 if stop.any() else n_good
        sel = order[:n_proc]
        p = f.mappoint[sel]
        create = (p < 0) | (w.pt_n_obs[np.maximum(p, 0)] < 1)
        ci = sel[create]
        if len(ci) == 0:
            return
        q_wc, t_wc = _inverse(f.q_cw, f.t_cw)
        R_wc = _quat_to_mat(q_wc)
        z = zs[ci]
        pc = np.stack(
            [
                (f.uv[ci, 0] - self.cam.cx) / self.cam.fx * z,
                (f.uv[ci, 1] - self.cam.cy) / self.cam.fy * z,
                z,
            ],
            -1,
        )
        pw = pc @ R_wc.T + t_wc
        for j, i in enumerate(ci):
            pid = w.alloc_point(pw[j], ref_kf=-1, created_kf_idx=-1)
            f.mappoint[i] = pid
            self.temp_points.append(pid)

    # ------------------------------------------------------------------

    def _project_points(self, frame: Frame, pts_pos):
        """Project world points with the frame's current pose guess."""
        R = _quat_to_mat(frame.q_cw)
        pc = pts_pos @ R.T + frame.t_cw
        z = pc[:, 2]
        z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = self.cam.fx * pc[:, 0] / z_safe + self.cam.cx
        v = self.cam.fy * pc[:, 1] / z_safe + self.cam.cy
        ur = u - self.cam.bf / z_safe
        inside = (
            (z > 0) & (u >= 0) & (v >= 0) & (u < self.cam.width) & (v < self.cam.height)
        )
        return np.stack([u, v], -1), ur, z, inside

    def _run_pose_opt(self, frame: Frame, anchored: bool = False) -> int:
        w = self.world
        has_pt = frame.mappoint >= 0
        idx = np.where(has_pt)[0]
        x_w = np.zeros((frame.feat_cap, 3), np.float32)
        if len(idx):
            x_w[idx] = w.pt_pos[frame.mappoint[idx]]
        obs_uvr = np.concatenate([frame.uv, frame.ur[:, None]], -1)
        base_args = (
            self.cam,
            jnp.array(frame.q_cw, jnp.float32),
            jnp.array(frame.t_cw, jnp.float32),
            jnp.array(x_w),
            jnp.array(obs_uvr, jnp.float32),
            jnp.array(frame.ur >= 0),
            jnp.array(self.sigma2_inv[frame.octave], jnp.float32),
            jnp.array(has_pt & frame.valid),
        )
        anc = self._gather_anchors(frame) if anchored else None
        if anc is not None:
            res = pose_solver.optimize_pose_anchored(
                *base_args,
                *anc,
                jnp.float32(self.cfg.tracking.anchor_chi2_gate),
                rounds=self.cfg.loc.pose_opt_rounds,
                iters=self.cfg.loc.pose_opt_iters,
            )
            q, t, is_out, n_inl, n_anc = fetch(
                (res.q, res.t, res.is_outlier, res.num_inliers, res.num_anchors)
            )
            self.dbg["n_anchors"] = int(n_anc)
        else:
            res = pose_solver.optimize_pose(
                *base_args,
                rounds=self.cfg.loc.pose_opt_rounds,
                iters=self.cfg.loc.pose_opt_iters,
            )
            q, t, is_out, n_inl = fetch(
                (res.q, res.t, res.is_outlier, res.num_inliers)
            )
        frame.set_pose(q.astype(np.float64), t.astype(np.float64))
        frame.is_outlier = is_out.copy()
        return int(n_inl)

    def _gather_anchors(self, frame: Frame):
        """Per-frame GMM structure anchors: tracked features whose map
        point carries a component association and which have a stereo
        depth measurement this frame. Returns jnp args or None."""
        gv = self.gmm_views
        if gv is None or not self.cfg.tracking.use_gmm_pose_anchor:
            return None
        w = self.world
        N = frame.feat_cap
        p = frame.mappoint
        ok = (p >= 0) & frame.valid & (frame.depth > 0)
        pc_ = np.clip(p, 0, None)
        comp = np.where(ok & w.pt_assoc_vetted[pc_], w.pt_assoc_comp[pc_], -1)
        ok &= comp >= 0
        if int(ok.sum()) < self.cfg.tracking.anchor_min_edges:
            return None
        k = np.maximum(comp, 0)
        z = np.where(ok, frame.depth, 1.0)
        xc = np.stack(
            [
                (frame.uv[:, 0] - self.cam.cx) / self.cam.fx * z,
                (frame.uv[:, 1] - self.cam.cy) / self.cam.fy * z,
                z,
            ],
            -1,
        ).astype(np.float32)
        deg = gv["is_degenerated"][k]
        anc_type = np.where(
            ok, np.where(deg, pose_solver.ANCHOR_DEG, pose_solver.ANCHOR_NONDEG), 0
        ).astype(np.int32)
        # deg info = lambda2 * z^2 (z clamped >= 1, cf gmmloc_opt.cpp:171-174);
        # nondeg edges carry their scale in sqrt_info
        zc = np.maximum(z, 1.0)
        weight = np.where(
            deg, self.cfg.tracking.anchor_lambda2 * zc * zc, 1.0
        ).astype(np.float32)
        return (
            jnp.array(xc),
            jnp.array(gv["means"][k], jnp.float32),
            jnp.array(gv["normal"][k], jnp.float32),
            jnp.array(gv["sqrt_info"][k], jnp.float32),
            jnp.array(anc_type),
            jnp.array(weight),
        )

    def _plausibility_gate(self, frame: Frame) -> None:
        """Reject a solved pose beyond physical per-frame motion limits
        relative to the prediction (see TrackingConfig.max_jump_*): coast
        on the prediction for this frame. At most max_coast consecutive
        frames — if the solve keeps disagreeing, the prediction chain is
        the wrong side and freezing on it starves the map (observed:
        coast-forever collapsed V1_03 to 15 KFs and lost tracking)."""
        qp = self.dbg.get("q_pred")
        tp = self.dbg.get("t_pred")
        if qp is None:
            return
        cfg = self.cfg.tracking
        # camera-center displacement (world frame)
        _, c_pred = _inverse(qp, tp)
        _, c_post = _inverse(frame.q_cw, frame.t_cw)
        dt = float(np.linalg.norm(c_post - c_pred))
        dq = abs(float(np.dot(qp, frame.q_cw)))
        drot = float(np.degrees(2 * np.arccos(min(1.0, dq))))
        if (dt > cfg.max_jump_trans or drot > cfg.max_jump_rot_deg) and (
            self._coast_streak < cfg.max_coast_frames
        ):
            frame.set_pose(qp, tp)
            self.dbg["coasted"] = True
            self._coast_streak += 1
        else:
            self._coast_streak = 0

    def _discard_outliers(self, frame: Frame) -> int:
        """Post-solve outlier stripping (tracking.cpp:355-377).
        Returns matches that belong to the persistent map."""
        w = self.world
        has = (frame.mappoint >= 0) & frame.valid
        out = has & frame.is_outlier
        pout = frame.mappoint[out]
        w.pt_last_visible_idx[pout] = frame.idx
        frame.mappoint[out] = -1
        frame.is_outlier[out] = False
        good = has & ~out
        return int((w.pt_n_obs[frame.mappoint[good]] > 0).sum())

    def _track_with_motion_model(self, frame: Frame) -> int:
        """tracking.cpp:334-393."""
        last = self.last_frame
        w = self.world
        th = self.cfg.tracking.motion_search_radius

        n = self._search_frame_to_frame(frame, th)
        self.dbg["n_motion_match"] = n
        if n < self.cfg.tracking.min_matches_motion:
            frame.mappoint[:] = -1
            n = self._search_frame_to_frame(frame, 2 * th)
            self.dbg["used_wide_retry"] = True
            self.dbg["n_motion_match"] = n
        if n < self.cfg.tracking.min_matches_motion:
            return 0
        m = frame.mappoint[frame.mappoint >= 0]
        self.dbg["n_tmp_edges"] = int((w.pt_n_obs[m] < 1).sum())
        self.dbg["n_per_edges"] = int((w.pt_n_obs[m] >= 1).sum())
        self.dbg["q_pred"] = frame.q_cw.copy()
        self.dbg["t_pred"] = frame.t_cw.copy()
        self._run_pose_opt(frame, anchored=True)
        return self._discard_outliers(frame)

    def _search_frame_to_frame(self, frame: Frame, th: float) -> int:
        """Guided search from last-frame landmarks (orb_matcher.cpp:410-542)."""
        last = self.last_frame
        w = self.world
        q_has = (last.mappoint >= 0) & last.valid & ~last.is_outlier
        pts = np.zeros((last.feat_cap, 3))
        ids = last.mappoint.copy()
        sel = np.where(q_has)[0]
        if len(sel) == 0:
            return 0
        pts[sel] = w.pt_pos[ids[sel]]
        uv, ur, z, inside = self._project_points(frame, pts)
        q_valid = q_has & inside

        octave = last.octave
        radius = th * self.scale_factors[octave]
        match, dist = matching.search_by_projection(
            jnp.array(uv, jnp.float32),
            jnp.array(np.where(last.ur >= 0, ur, -1.0), jnp.float32),
            jnp.array(last.desc),
            jnp.array(octave),
            jnp.array(last.angle),
            jnp.array(q_valid),
            jnp.array(radius, jnp.float32),
            jnp.array(octave - 1),
            jnp.array(octave + 1),
            jnp.array(frame.uv, jnp.float32),
            jnp.array(frame.ur, jnp.float32),
            jnp.array(frame.desc),
            jnp.array(frame.octave),
            jnp.array(frame.angle),
            jnp.array(frame.valid),
            jnp.array(frame.mappoint >= 0),
            desc_thresh=matching.TH_HIGH,
            nn_ratio=1.0,
            use_rotation=True,
        )
        match = fetch(match)
        qi = np.where(match >= 0)[0]
        frame.mappoint[match[qi]] = ids[qi]
        return len(qi)

    def _track_keyframe(self, frame: Frame) -> int:
        """BoW-free re-track against the reference KF (tracking.cpp:297-332;
        searchByBoW replaced by mutual-best Hamming matching)."""
        w = self.world
        kf = self.ref_keyframe
        frame.mappoint[:] = -1
        match, _ = matching.mutual_best_match(
            jnp.array(frame.desc),
            jnp.array(frame.valid),
            jnp.array(w.kf_feat_desc[kf]),
            jnp.array(w.kf_feat_valid[kf] & (w.kf_obs_point[kf] >= 0)),
            max_dist=matching.TH_LOW,
        )
        match = fetch(match)
        mi = np.where(match >= 0)[0]
        p = w.kf_obs_point[kf, match[mi]]
        ok = (p >= 0) & w.pt_valid[np.maximum(p, 0)]
        frame.mappoint[mi[ok]] = p[ok]
        n = int(ok.sum())
        if n < 15:
            return 0
        frame.set_pose(self.last_frame.q_cw, self.last_frame.t_cw)
        self._run_pose_opt(frame, anchored=True)
        return self._discard_outliers(frame)

    # ------------------------------------------------------------------

    def _update_local_map(self, frame: Frame) -> None:
        """tracking.cpp:119-207 (vectorized: the per-point dict counting
        was a measured per-frame host hotspot, VERDICT r1 weak #3)."""
        w = self.world
        has = frame.mappoint >= 0
        idx = np.where(has)[0]
        if len(idx) == 0:
            return
        pts = frame.mappoint[idx]
        bad = ~w.pt_valid[pts]
        if bad.any():
            frame.mappoint[idx[bad]] = -1
            pts = pts[~bad]
        if len(pts) == 0:
            return
        okf = w.pt_obs_kf[pts].ravel()
        okf = okf[okf >= 0]
        if len(okf) == 0:
            return
        counts = np.bincount(okf, minlength=w.MK)
        counts[~w.kf_valid] = 0
        kf_max = int(np.argmax(counts))
        if counts[kf_max] == 0:
            return
        local = np.where(counts > 0)[0]
        self.ref_keyframe = kf_max
        frame.ref_kf = self.ref_keyframe
        self.local_keyframes = local.tolist()

        obs = w.kf_obs_point[local].ravel()
        obs = obs[obs >= 0]
        pts_u = np.unique(obs)
        self.local_points = pts_u[w.pt_valid[pts_u]].astype(np.int64)

    def _check_scale_and_visible(self, frame: Frame, pids):
        """Batched mappoint.cpp:257-299 gates. Returns (ok, pred_level)."""
        w = self.world
        q_wc, t_wc = _inverse(frame.q_cw, frame.t_cw)
        pos = w.pt_pos[pids]
        v = pos - t_wc
        dist = np.linalg.norm(v, axis=-1)
        mx = 1.2 * w.pt_max_dist[pids]
        mn = 0.8 * w.pt_min_dist[pids]
        ok = (dist >= mn) & (dist <= mx) & (dist > 1e-9)
        view_cos = np.einsum("ni,ni->n", v, w.pt_normal[pids]) / np.clip(dist, 1e-9, None)
        ok &= view_cos >= 0.5
        ratio = w.pt_max_dist[pids] / np.clip(dist, 1e-9, None)
        lvl = np.ceil(np.log(np.clip(ratio, 1e-9, None)) / self.log_sf).astype(np.int32)
        lvl = np.clip(lvl, 0, self.num_levels - 1)
        return ok, lvl

    def _search_local_points(self, frame: Frame) -> None:
        """tracking.cpp:210-267."""
        w = self.world
        # bump visibility of points already matched in this frame
        for i in np.where(frame.mappoint >= 0)[0]:
            p = frame.mappoint[i]
            if not w.pt_valid[p]:
                frame.mappoint[i] = -1
            else:
                w.pt_num_visible[p] += 1
                w.pt_last_visible_idx[p] = frame.idx

        if len(self.local_points) == 0:
            return
        cand = self.local_points[
            w.pt_last_visible_idx[self.local_points] != frame.idx
        ]
        if len(cand) == 0:
            return
        uv, ur, z, inside = self._project_points(frame, w.pt_pos[cand])
        ok, lvl = self._check_scale_and_visible(frame, cand)
        ok &= inside
        cand = cand[ok]
        if len(cand) == 0:
            return
        uv, ur, lvl = uv[ok], ur[ok], lvl[ok]
        w.pt_num_visible[cand] += 1

        th = 5.0 if frame.idx < 2 else self.cfg.tracking.local_search_radius
        radius = th * self.scale_factors[lvl]
        # pad to static capacity for the jit kernel
        N = self.cfg.frame.feat_cap
        if len(cand) > N:
            cand, uv, ur, lvl, radius = (
                cand[:N], uv[:N], ur[:N], lvl[:N], radius[:N]
            )
        pad = N - len(cand)

        def padded(a, fill, dtype):
            out = np.full((N,) + np.asarray(a).shape[1:], fill, dtype)
            out[: len(cand)] = a
            return out

        match, _ = matching.search_by_projection(
            jnp.array(padded(uv, 0.0, np.float32)),
            jnp.array(padded(ur, -1.0, np.float32)),
            jnp.array(padded(w.pt_desc[cand], 0, np.uint8)),
            jnp.array(padded(lvl, 0, np.int32)),
            jnp.zeros(N, jnp.float32),
            jnp.array(padded(np.ones(len(cand), bool), False, bool)),
            jnp.array(padded(radius, 1.0, np.float32)),
            jnp.array(padded(lvl - 1, 0, np.int32)),
            jnp.array(padded(lvl, 0, np.int32)),
            jnp.array(frame.uv, jnp.float32),
            jnp.array(frame.ur, jnp.float32),
            jnp.array(frame.desc),
            jnp.array(frame.octave),
            jnp.array(frame.angle),
            jnp.array(frame.valid),
            jnp.array(frame.mappoint >= 0),
            desc_thresh=matching.TH_HIGH,
            nn_ratio=self.cfg.loc.match_nn_ratio_local,
            use_rotation=False,
        )
        match = fetch(match)
        qi = np.where(match >= 0)[0]
        frame.mappoint[match[qi]] = cand[qi]

    def _track_local_map(self, frame: Frame) -> int:
        """tracking.cpp:269-294 (+ per-frame GMM structure anchors)."""
        w = self.world
        self._run_pose_opt(frame, anchored=True)
        has = (frame.mappoint >= 0) & frame.valid
        inl = has & ~frame.is_outlier
        np.add.at(w.pt_num_found, frame.mappoint[inl], 1)
        num_inliers = int((w.pt_n_obs[frame.mappoint[inl]] > 0).sum())
        frame.mappoint[has & frame.is_outlier] = -1
        return num_inliers

    # ------------------------------------------------------------------

    def _cleanup(self, frame: Frame) -> None:
        """clearTemporalPoints (tracking.cpp:379-395)."""
        w = self.world
        has = frame.mappoint >= 0
        tmp = has.copy()
        tmp[has] = w.pt_n_obs[frame.mappoint[has]] < 1
        frame.is_outlier[tmp] = False
        frame.mappoint[tmp] = -1
        for p in self.temp_points:
            if w.pt_valid[p] and w.pt_n_obs[p] < 1:
                w.remove_point(p)
        self.temp_points.clear()

    # ------------------------------------------------------------------
    # fused single-dispatch path (tracking/fused.py)
    # ------------------------------------------------------------------

    def _track_fused(self, frame: Frame):
        """One-device-call variant of track(). Returns TrackStat, or None
        to request the classic fallback (e.g. too few inliers)."""
        pend = self.fused_dispatch(frame)
        if pend is None:
            return None
        return self.fused_complete(pend)

    def fused_dispatch(self, frame: Frame, prime_chain: bool = False):
        """Prep + single device dispatch; starts the overlapped readback
        and defers all host bookkeeping to fused_complete. Returns a
        FusedPending, or None to request the classic path.

        prime_chain: also record the dispatch's device arrays as the
        chain state for subsequent fused_dispatch_chained calls (the
        deep pipeline's host-primed first link)."""
        self._prime_chain = prime_chain
        w = self.world
        cam = self.cam
        t_prep = Timer("track/fused_prep").start()
        self._update_last_frame()
        if not self.last_frame.is_keyframe:
            self._create_temporal_points()
        last = self.last_frame

        q_has = (last.mappoint >= 0) & last.valid & ~last.is_outlier
        sel = np.where(q_has)[0]
        if len(sel) < 10:
            return None
        last_pts = np.zeros((last.feat_cap, 3), np.float32)
        last_pts[sel] = w.pt_pos[last.mappoint[sel]]

        # local-map snapshot (one frame stale); exclude points carried by
        # the last frame so stage 2 cannot duplicate stage-1 matches.
        # In kf-refresh mode the exclusion moves into the kernel
        # (map_is_stale) because the carried set changes per frame while
        # the uploaded table does not.
        tk = self.cfg.tracking
        kf_mode = tk.fused_packed_io and tk.fused_map_refresh == "kf"
        P = tk.fused_local_map_cap
        lp = self.local_points
        lp = lp[w.pt_valid[lp]] if len(lp) else lp
        if len(lp) and not kf_mode:
            carried = set(last.mappoint[sel].tolist())
            lp = np.array([p for p in lp if p not in carried], np.int64)
        lp = lp[:P]
        n_lp = len(lp)
        if tk.fused_packed_io:
            return self._dispatch_packed(
                frame, last, q_has, last_pts, lp, n_lp, t_prep
            )
        map_pts = np.zeros((P, 3), np.float32)
        map_desc = np.zeros((P, 32), np.uint8)
        map_normal = np.zeros((P, 3), np.float32)
        map_min = np.zeros(P, np.float32)
        map_max = np.zeros(P, np.float32)
        map_ok = np.zeros(P, bool)
        if n_lp:
            map_pts[:n_lp] = w.pt_pos[lp]
            map_desc[:n_lp] = w.pt_desc[lp]
            map_normal[:n_lp] = w.pt_normal[lp]
            map_min[:n_lp] = w.pt_min_dist[lp]
            map_max[:n_lp] = w.pt_max_dist[lp]
            map_ok[:n_lp] = True

        # slot-aligned GMM anchor tables (vetted associations only, as
        # _gather_anchors); the kernel gathers per-feature anchors at the
        # final assignment and runs the anchored second solve
        gv = self.gmm_views
        use_anc = self.cfg.tracking.use_gmm_pose_anchor and gv is not None
        anc_kw = {}
        if use_anc:
            def anc_tables(point_ids, n_slots):
                t = np.zeros(n_slots, np.int32)
                mean = np.zeros((n_slots, 3), np.float32)
                norm = np.zeros((n_slots, 3), np.float32)
                sqi = np.zeros((n_slots, 3, 3), np.float32)
                if len(point_ids):
                    n = len(point_ids)
                    pid = np.asarray(point_ids)
                    okp = (pid >= 0) & w.pt_assoc_vetted[np.clip(pid, 0, None)]
                    comp = np.where(
                        okp, w.pt_assoc_comp[np.clip(pid, 0, None)], -1
                    )
                    k = np.maximum(comp, 0)
                    deg = gv["is_degenerated"][k]
                    t[:n] = np.where(
                        comp >= 0,
                        np.where(deg, pose_solver.ANCHOR_DEG,
                                 pose_solver.ANCHOR_NONDEG),
                        0,
                    )
                    mean[:n] = gv["means"][k]
                    norm[:n] = gv["normal"][k]
                    sqi[:n] = gv["sqrt_info"][k]
                return (jnp.array(t), jnp.array(mean), jnp.array(norm),
                        jnp.array(sqi))

            la = anc_tables(last.mappoint, last.feat_cap)
            ma = anc_tables(lp, P)
            anc_kw = dict(
                use_anchors=True,
                last_anc_type=la[0], last_anc_mean=la[1],
                last_anc_normal=la[2], last_anc_sqrt_info=la[3],
                map_anc_type=ma[0], map_anc_mean=ma[1],
                map_anc_normal=ma[2], map_anc_sqrt_info=ma[3],
                anchor_lambda2=float(self.cfg.tracking.anchor_lambda2),
                anchor_chi2_gate=float(self.cfg.tracking.anchor_chi2_gate),
                anchor_min_edges=int(self.cfg.tracking.anchor_min_edges),
            )

        th_local = 5.0 if frame.idx < 2 else self.cfg.tracking.local_search_radius
        t_prep.stop()
        t_disp = Timer("track/fused_enqueue").start()
        res = fused.fused_track_step(
            cam,
            jnp.array(frame.q_cw, jnp.float32), jnp.array(frame.t_cw, jnp.float32),
            jnp.array(last_pts),
            jnp.array(last.desc), jnp.array(last.octave),
            jnp.array(last.angle), jnp.array(last.ur, jnp.float32),
            jnp.array(q_has),
            jnp.array(frame.uv, jnp.float32), jnp.array(frame.ur, jnp.float32),
            jnp.array(frame.desc), jnp.array(frame.octave),
            jnp.array(frame.angle), jnp.array(frame.valid),
            jnp.array(self.sigma2_inv[frame.octave], jnp.float32),
            jnp.array(map_pts), jnp.array(map_desc), jnp.array(map_normal),
            jnp.array(map_min), jnp.array(map_max), jnp.array(map_ok),
            jnp.array(self.scale_factors, jnp.float32),
            float(self.log_sf), self.num_levels,
            motion_radius=self.cfg.tracking.motion_search_radius,
            local_radius=th_local,
            **anc_kw,
        )

        t_disp.stop()
        # start the overlapped readback now; the blocking wait happens in
        # fused_complete (pipelined mode overlaps it with the caller's
        # next-frame work; sync mode completes immediately)
        return FusedPending(
            frame=frame, fetch=AsyncFetch(tuple(res)), lp=lp, n_lp=n_lp,
            q_pred=frame.q_cw.copy(), t_pred=frame.t_cw.copy(),
        )

    # ---------------- packed-IO fused path (transfer-minimal) ----------

    def _pack_frame(self, frame: Frame) -> np.ndarray:
        pk = np.zeros((frame.feat_cap, fused.CUR_W), np.float32)
        pk[:, 0:2] = frame.uv
        pk[:, 2] = frame.ur
        pk[:, 3] = frame.angle
        pk[:, 4] = self.sigma2_inv[frame.octave]
        pk[:, 5] = frame.valid
        pk[:, 6] = frame.octave
        pk[:, 8:16] = np.ascontiguousarray(frame.desc).view(np.float32)
        return pk

    def _dev_cur(self, frame: Frame):
        """Device copy of the frame's packed feature table (uploaded at
        its own dispatch; rebuilt here only after classic-path frames)."""
        d = getattr(frame, "_dev_cur", None)
        if d is None:
            d = jnp.array(self._pack_frame(frame))
            record_uploads()
            frame._dev_cur = d
        return d

    def _dev_static(self):
        if "scales" not in self._dev:
            self._dev["scales"] = jnp.array(self.scale_factors, jnp.float32)
            gv = self.gmm_views
            if gv is not None:
                K = len(gv["means"])
                tab = np.zeros((K, fused.GMM_W), np.float32)
                tab[:, 0:3] = gv["means"]
                tab[:, 3:6] = gv["normal"]
                tab[:, 6:15] = gv["sqrt_info"].reshape(K, 9)
                tab[:, 15] = gv["is_degenerated"]
            else:
                tab = np.zeros((1, fused.GMM_W), np.float32)
            self._dev["gmm_tab"] = jnp.array(tab)
        return self._dev["gmm_tab"], self._dev["scales"]

    def _vetted_comp(self, pid: np.ndarray) -> np.ndarray:
        """BA-vetted GMM component per point id (-1 where none/unvetted);
        mirrors _gather_anchors/anc_tables gating."""
        w = self.world
        pc = np.clip(pid, 0, None)
        ok = (pid >= 0) & w.pt_assoc_vetted[pc]
        return np.where(ok, w.pt_assoc_comp[pc], -1).astype(np.float32)

    def _dispatch_packed(self, frame, last, q_has, last_pts, lp, n_lp, t_prep):
        w = self.world
        F = frame.feat_cap
        P = self.cfg.tracking.fused_local_map_cap
        tk = self.cfg.tracking

        scal = np.zeros(16, np.float32)
        scal[0:4] = frame.q_cw
        scal[4:7] = frame.t_cw
        scal[7] = tk.motion_search_radius
        scal[8] = 5.0 if frame.idx < 2 else tk.local_search_radius

        dyn = np.zeros((F, fused.DYN_W), np.float32)
        dyn[:, 0:3] = last_pts
        dyn[:, 3] = q_has
        dyn[:, 4] = self._vetted_comp(last.mappoint)
        dyn[:, 5] = last.mappoint

        kf_mode = tk.fused_map_refresh == "kf"
        # cache key: persistent-map mutation counter (NOT raw counts, which
        # collide when BA moves pt_pos in place or alloc/cull balance out)
        token = w.map_version if kf_mode else None
        if kf_mode and self._dev.get("map_token") == token:
            map_dev = self._dev["map_dev"]
            lp = self._dev["map_lp"]
            n_lp = len(lp)
        else:
            map_tab = np.zeros((P, fused.MAP_W), np.float32)
            map_tab[:, 9] = -1.0
            if n_lp:
                map_tab[:n_lp, 0:3] = w.pt_pos[lp]
                map_tab[:n_lp, 3:6] = w.pt_normal[lp]
                map_tab[:n_lp, 6] = w.pt_min_dist[lp]
                map_tab[:n_lp, 7] = w.pt_max_dist[lp]
                map_tab[:n_lp, 8] = 1.0
                map_tab[:n_lp, 9] = self._vetted_comp(lp)
                map_tab[:n_lp, 10] = lp
                map_tab[:n_lp, 16:24] = np.ascontiguousarray(
                    w.pt_desc[lp]
                ).view(np.float32)
            map_dev = jnp.array(map_tab)
            record_uploads()
            if kf_mode:
                self._dev["map_token"] = token
                self._dev["map_dev"] = map_dev
                self._dev["map_lp"] = lp

        gmm_tab, scales = self._dev_static()
        use_anc = tk.use_gmm_pose_anchor and self.gmm_views is not None
        last_dev = self._dev_cur(last)
        cur_dev = jnp.array(self._pack_frame(frame))
        record_uploads(3)  # scal + dyn (below) + cur: the per-frame budget
        frame._dev_cur = cur_dev
        dyn_dev = jnp.array(dyn)
        t_prep.stop()
        t_disp = Timer("track/fused_enqueue").start()
        out = fused.fused_track_step_packed(
            self.cam,
            jnp.array(scal), cur_dev, last_dev, dyn_dev,
            map_dev, gmm_tab, scales,
            float(self.log_sf), self.num_levels,
            use_anchors=use_anc, map_is_stale=kf_mode,
            anchor_lambda2=float(tk.anchor_lambda2),
            anchor_chi2_gate=float(tk.anchor_chi2_gate),
            anchor_min_edges=int(tk.anchor_min_edges),
            pose_impl=tk.pose_impl,
        )
        t_disp.stop()
        if getattr(self, "_prime_chain", False) and kf_mode:
            # record this dispatch's device state as the chain root: the
            # next frame can be dispatched WITHOUT draining this one
            vq, vt = (self.host_vel if self.host_vel is not None
                      and self.host_vel[0] is not None else (None, None))
            vel = np.zeros(8, np.float32)
            if vq is not None:
                vel[0:4], vel[4:7], vel[7] = vq, vt, 1.0
            pose_prev = np.zeros(7, np.float32)
            if last is not None:
                pose_prev[0:4], pose_prev[4:7] = last.q_cw, last.t_cw
            self._chain = dict(
                out=out, cur=cur_dev, dyn=dyn_dev, map_tab=map_dev,
                lp=lp, n_lp=n_lp,
                vel=jnp.array(vel), pose_prev=jnp.array(pose_prev),
            )
            record_uploads(2)
        return FusedPending(
            frame=frame, fetch=AsyncFetch((out,)), lp=lp, n_lp=n_lp,
            q_pred=frame.q_cw.copy(), t_pred=frame.t_cw.copy(), packed=True,
        )

    def invalidate_chain(self) -> None:
        """Drop the device-chained pipeline state (rewind / mode switch)."""
        self._chain = None

    def fused_dispatch_chained(self, frame: Frame):
        """Dispatch `frame` from the device-resident chain state: no
        readback of the previous frame is needed — pose prediction,
        landmark table and temporal points are computed on device
        (fused.fused_track_step_chained). The ONLY per-frame transfer is
        the new frame's packed feature table. Returns a FusedPending
        (drain with a pipeline_depth lag), or None if the chain is not
        primed."""
        ch = self._chain
        dw = self.dev_world
        if ch is None or dw is None:
            return None
        tk = self.cfg.tracking
        w = self.world
        t_prep = Timer("track/chain_prep").start()
        P = tk.fused_local_map_cap

        # kf-cadence local-map refresh (same token cache as _dispatch_packed)
        token = w.map_version
        if self._dev.get("map_token") == token:
            map_dev = self._dev["map_dev"]
            lp = self._dev["map_lp"]
        else:
            lp = self.local_points
            lp = lp[w.pt_valid[lp]] if len(lp) else lp
            lp = lp[:P]
            n_lp = len(lp)
            map_tab = np.zeros((P, fused.MAP_W), np.float32)
            map_tab[:, 9] = -1.0
            if n_lp:
                map_tab[:n_lp, 0:3] = w.pt_pos[lp]
                map_tab[:n_lp, 3:6] = w.pt_normal[lp]
                map_tab[:n_lp, 6] = w.pt_min_dist[lp]
                map_tab[:n_lp, 7] = w.pt_max_dist[lp]
                map_tab[:n_lp, 8] = 1.0
                map_tab[:n_lp, 9] = self._vetted_comp(lp)
                map_tab[:n_lp, 10] = lp
                map_tab[:n_lp, 16:24] = np.ascontiguousarray(
                    w.pt_desc[lp]
                ).view(np.float32)
            map_dev = jnp.array(map_tab)
            record_uploads()
            self._dev["map_token"] = token
            self._dev["map_dev"] = map_dev
            self._dev["map_lp"] = lp

        gmm_tab, scales = self._dev_static()
        use_anc = tk.use_gmm_pose_anchor and self.gmm_views is not None
        cur_dev = jnp.array(self._pack_frame(frame))
        record_uploads()  # cur: the only per-frame transfer
        frame._dev_cur = cur_dev
        t_prep.stop()
        t_disp = Timer("track/chain_enqueue").start()
        out_ext, dyn_new, vel_new, pose_prev = fused.fused_track_step_chained(
            self.cam,
            ch["out"], ch["cur"], ch["dyn"], ch["map_tab"],
            ch["pose_prev"], ch["vel"],
            dw.pt_pos, dw.pt_valid, dw.pt_comp,
            cur_dev, map_dev, gmm_tab, scales,
            float(self.log_sf), self.num_levels,
            use_anchors=use_anc,
            anchor_lambda2=float(tk.anchor_lambda2),
            anchor_chi2_gate=float(tk.anchor_chi2_gate),
            anchor_min_edges=int(tk.anchor_min_edges),
            pose_impl=tk.pose_impl,
            velocity_ema=float(tk.velocity_ema),
            velocity_damping=float(tk.velocity_damping),
            th_depth=float(self.th_depth),
            temp_cap=int(tk.temporal_points_cap),
            motion_radius=float(tk.motion_search_radius),
            local_radius=float(tk.local_search_radius),
        )
        t_disp.stop()
        self._chain = dict(
            out=out_ext, cur=cur_dev, dyn=dyn_new, map_tab=map_dev,
            lp=lp, n_lp=len(lp), vel=vel_new, pose_prev=pose_prev,
        )
        return FusedPending(
            frame=frame, fetch=AsyncFetch((out_ext,)), lp=lp, n_lp=len(lp),
            q_pred=None, t_pred=None, packed=True, chained=True,
        )

    # -------------------------------------------------------------------

    def fused_complete(self, pend: "FusedPending"):
        """Materialize the readback and run all host bookkeeping for the
        dispatched frame. Returns TrackStat, or None to request the
        classic fallback (too few inliers)."""
        w = self.world
        frame = pend.frame
        if pend.chained:
            # the chained dispatch skipped the host-side last-frame prep;
            # run it now so last.mappoint carries the temporal-point ids
            # the device synthesized at dispatch (same selection rule —
            # fused._chain_prep mirrors _create_temporal_points)
            self._update_last_frame()
            if not self.last_frame.is_keyframe:
                self._create_temporal_points()
        last = self.last_frame
        lp, n_lp = pend.lp, pend.n_lp
        t_fetch = Timer("track/fused_fetch").start()
        if pend.packed:
            (out,) = pend.fetch.get()
            if pend.chained:
                # +7 extension carries the on-device pose prediction
                pend.q_pred = out[-7:-3].astype(np.float64)
                pend.t_pred = out[-3:].astype(np.float64)
                out = out[:-7]
            rq, rt, fp, fl, r_out, r_ninl, r_nmot, r_inview, r_nanc = (
                fused.unpack_result(
                    out, frame.feat_cap, self.cfg.tracking.fused_local_map_cap
                )
            )
        else:
            rq, rt, fp, fl, r_out, r_ninl, r_nmot, r_inview, r_nanc = (
                pend.fetch.get()
            )
        num_inliers = int(r_ninl)
        t_fetch.stop()
        t_book = Timer("track/fused_book").start()
        if num_inliers < self.cfg.tracking.min_matches_track:
            frame.mappoint[:] = -1
            t_book.stop()
            return None  # classic path (incl. trackKeyFrame fallback)

        # prediction pose (EMA constant-velocity, set by the system before
        # track()) — recorded for the plausibility gate below
        q_pred, t_pred = pend.q_pred, pend.t_pred
        frame.set_pose(rq.astype(np.float64), rt.astype(np.float64))
        frame.is_outlier = r_out.copy()
        frame.mappoint[:] = -1
        m_local = (fp >= 0) & fl
        m_last = (fp >= 0) & ~fl
        if n_lp:
            frame.mappoint[m_local] = lp[np.clip(fp[m_local], 0, n_lp - 1)]
        frame.mappoint[m_last] = last.mappoint[fp[m_last]]

        # bookkeeping (visibility / found counters, mappoint.cpp stats)
        if n_lp:
            in_view = r_inview[:n_lp]
            w.pt_num_visible[lp[in_view]] += 1
            w.pt_last_visible_idx[lp[in_view]] = frame.idx
        has = (frame.mappoint >= 0) & frame.valid
        inl = has & ~frame.is_outlier
        np.add.at(w.pt_num_found, frame.mappoint[inl], 1)
        frame.mappoint[has & frame.is_outlier] = -1
        frame.is_outlier[:] = False

        self.stat = TrackStat(res=True)
        self.stat.num_match_inliers = int(
            (w.pt_n_obs[frame.mappoint[frame.mappoint >= 0]] > 0).sum()
        )
        selg = frame.mappoint[frame.mappoint >= 0]
        self.dbg = {
            "path": "fused",
            "n_motion_match": int(r_nmot),
            "n_gmm_inliers": int((w.pt_assoc_comp[selg] >= 0).sum()),
            "n_anchors": int(r_nanc),
            "q_pred": q_pred,
            "t_pred": t_pred,
        }
        self._plausibility_gate(frame)

        # local map refresh for the NEXT frame + reference KF + ratio_map
        self._update_local_map(frame)
        near = (frame.depth > 0) & (frame.depth < self.th_depth) & frame.valid
        num_total = int(near.sum())
        selm = near & (frame.mappoint >= 0)
        num_map = int((w.pt_n_obs[frame.mappoint[selm]] > 0).sum())
        self.stat.ratio_map = num_map / max(1, num_total)

        self._cleanup(frame)
        self.last_frame = frame
        t_book.stop()
        return self.stat
