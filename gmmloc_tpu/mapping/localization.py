"""Back-end: keyframe processing, culling, triangulation, fusion, local BA.

TPU-native replacement for Localization (ref:
/root/reference/gmmloc/src/modules/localization.cpp, localization_opt.cpp).
Offline-synchronous pipeline (spinOnce, localization.cpp:65-122):

  processNewKeyFrame -> removeMapPoints -> createMapPoints ->
  searchInNeighbors -> jointOptimization -> removeKeyFrames

The heavy stages — triangulation search/solve and the staged local BA —
run as jitted batched kernels; map surgery stays on the host registry.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..features import matching
from ..geometry import camera as cam_mod
from ..solver import local_ba, point_solver
from ..utils.timing import Timer
from . import map_state as ms
from .association import GMMAssociator


class Localization:
    def __init__(
        self,
        cfg: SystemConfig,
        cam: cam_mod.CameraParams,
        world: ms.MapState,
        associator: GMMAssociator,
    ):
        self.cfg = cfg
        self.cam = cam
        self.world = world
        self.assoc = associator
        self.queue: List[int] = []
        self.candidate_points: List[int] = []
        # per-BA-solve shape/occupancy stats (host-side, for perf tuning)
        self.ba_stats: List[dict] = []
        self.curr_kf: int = -1
        self.is_idle = True
        self.abort_ba = False
        K = np.array(
            [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]]
        )
        self._K = K

    # ------------------------------------------------------------------

    def insert_keyframe(self, kf: int) -> None:
        self.queue.append(kf)
        self.abort_ba = True

    def count_queue(self) -> int:
        return len(self.queue)

    def spin_once(self) -> None:
        """Ref: spinOnce (localization.cpp:65-122)."""
        if not self.queue:
            return
        self.is_idle = False
        with Timer("loc"):
            with Timer("loc/miscs"):
                self.process_new_keyframe()
                self.remove_map_points()
                self.create_map_points()
                if not self.queue:
                    self.search_in_neighbors()
            self.abort_ba = False
            if not self.queue:
                if self.world.n_keyframes() > 2:
                    with Timer("loc/ba"):
                        self.joint_optimization()
                self.remove_keyframes()
        self.is_idle = True

    # ------------------------------------------------------------------

    def process_new_keyframe(self) -> None:
        """Bind observations, update covisibility (localization.cpp:412-447)."""
        w = self.world
        kf = self.queue.pop(0)
        self.curr_kf = kf
        obs = w.kf_obs_point[kf]
        new_pts = []
        for i in np.where(obs >= 0)[0]:
            p = obs[i]
            if not w.pt_valid[p]:
                w.kf_obs_point[kf, i] = -1
                continue
            if not (w.pt_obs_kf[p] == kf).any():
                w.add_observation(p, kf, int(i))
                new_pts.append(p)
            else:
                self.candidate_points.append(p)
        for p in new_pts:
            w.compute_distinctive_descriptor(p)
        if new_pts:
            w.update_normal_and_depth_batch(np.array(new_pts))
        w.update_connections(kf)

    def remove_map_points(self) -> None:
        """Cull recent map points (localization.cpp:127-150)."""
        w = self.world
        curr_idx = w.kf_frame_idx[self.curr_kf]
        keep = []
        for p in self.candidate_points:
            if not w.pt_valid[p]:
                continue
            found_ratio = w.pt_num_found[p] / max(1, w.pt_num_visible[p])
            age = curr_idx - w.pt_created_kf_idx[p]
            if found_ratio < self.cfg.loc.cull_found_ratio:
                w.remove_point(p)
            elif age >= 2 and w.pt_n_obs[p] <= self.cfg.loc.cull_min_obs:
                w.remove_point(p)
            elif age >= 3:
                pass  # mature: stop monitoring
            else:
                keep.append(p)
        self.candidate_points = keep

    # ------------------------------------------------------------------

    def create_map_points(self) -> int:
        """Triangulate new points with covisible KFs
        (localization_opt.cpp:206-455)."""
        w = self.world
        cfg = self.cfg
        kf1 = self.curr_kf
        neigh = w.best_covisible(kf1, 10)
        sigma2 = w.pyr["sigma2"]
        sf = w.pyr["scale_factors"]
        ratio_factor = 1.5 * cfg.frame.scale_factor

        q1, t1 = w.kf_q[kf1], w.kf_t[kf1]
        q1_wc, t1_wc = ms._inverse(q1, t1)
        R1_wc = ms._quat_to_mat(q1_wc)
        baseline_min = self.cam.bf / self.cam.fx

        free1 = w.kf_feat_valid[kf1] & (w.kf_obs_point[kf1] < 0)
        n_new = 0
        for kf2 in neigh:
            t2_wc = -ms._quat_to_mat(w.kf_q[kf2]).T @ w.kf_t[kf2]
            if np.linalg.norm(t2_wc - t1_wc) < baseline_min:
                continue  # too-short baseline (:259-262)

            q2, t2 = w.kf_q[kf2], w.kf_t[kf2]
            fmat = np.asarray(
                matching.fundamental_matrix(
                    jnp.array(q1, jnp.float32), jnp.array(t1, jnp.float32),
                    jnp.array(q2, jnp.float32), jnp.array(t2, jnp.float32),
                    jnp.array(self._K, jnp.float32), jnp.array(self._K, jnp.float32),
                )
            )
            # epipole of KF1 center in KF2 (:156-161)
            C2 = ms._quat_to_mat(q2) @ t1_wc + t2
            ep = np.array(
                [
                    self.cam.fx * C2[0] / C2[2] + self.cam.cx,
                    self.cam.fy * C2[1] / C2[2] + self.cam.cy,
                ]
            )
            free2 = w.kf_feat_valid[kf2] & (w.kf_obs_point[kf2] < 0)
            match12 = np.asarray(
                matching.search_for_triangulation(
                    jnp.array(w.kf_feat_uv[kf1], jnp.float32),
                    jnp.array(w.kf_feat_ur[kf1], jnp.float32),
                    jnp.array(w.kf_feat_desc[kf1]),
                    jnp.array(w.kf_feat_octave[kf1]),
                    jnp.array(w.kf_feat_angle[kf1]),
                    jnp.array(free1),
                    jnp.array(w.kf_feat_uv[kf2], jnp.float32),
                    jnp.array(w.kf_feat_ur[kf2], jnp.float32),
                    jnp.array(w.kf_feat_desc[kf2]),
                    jnp.array(w.kf_feat_octave[kf2]),
                    jnp.array(w.kf_feat_angle[kf2]),
                    jnp.array(free2),
                    jnp.array(fmat, jnp.float32),
                    jnp.array(ep, jnp.float32),
                    jnp.array(sigma2, jnp.float32),
                )
            )
            idx1 = np.where(match12 >= 0)[0]
            if len(idx1) == 0:
                continue
            idx2 = match12[idx1]
            created = self._triangulate_matches(kf1, kf2, idx1, idx2, ratio_factor)
            n_new += created
            free1 = w.kf_feat_valid[kf1] & (w.kf_obs_point[kf1] < 0)
        return n_new

    def _triangulate_matches(self, kf1, kf2, idx1, idx2, ratio_factor) -> int:
        """Init (DLT / stereo unproject) + batched GMM-constrained solve +
        acceptance gates (localization_opt.cpp:283-445)."""
        w = self.world
        cfg = self.cfg
        cam = self.cam
        M = len(idx1)
        sigma2 = w.pyr["sigma2"]
        sigma2_inv = w.pyr["sigma2_inv"]
        sf = w.pyr["scale_factors"]

        q1, t1 = w.kf_q[kf1], w.kf_t[kf1]
        q2, t2 = w.kf_q[kf2], w.kf_t[kf2]
        R1, R2 = ms._quat_to_mat(q1), ms._quat_to_mat(q2)
        T1 = np.eye(4)
        T1[:3, :3], T1[:3, 3] = R1, t1
        T2 = np.eye(4)
        T2[:3, :3], T2[:3, 3] = R2, t2
        t1_wc, t2_wc = -R1.T @ t1, -R2.T @ t2

        uv1 = w.kf_feat_uv[kf1][idx1]
        uv2 = w.kf_feat_uv[kf2][idx2]
        ur1 = w.kf_feat_ur[kf1][idx1]
        ur2 = w.kf_feat_ur[kf2][idx2]
        z1 = w.kf_feat_depth[kf1][idx1]
        z2 = w.kf_feat_depth[kf2][idx2]
        oct1 = w.kf_feat_octave[kf1][idx1]
        oct2 = w.kf_feat_octave[kf2][idx2]
        st1 = ur1 >= 0
        st2 = ur2 >= 0

        xn1 = np.stack(
            [(uv1[:, 0] - cam.cx) / cam.fx, (uv1[:, 1] - cam.cy) / cam.fy, np.ones(M)], -1
        )
        xn2 = np.stack(
            [(uv2[:, 0] - cam.cx) / cam.fx, (uv2[:, 1] - cam.cy) / cam.fy, np.ones(M)], -1
        )
        ray1 = xn1 @ R1  # = R1^T? careful: ray in world = R_wc @ xn = R1.T @ xn
        ray1 = xn1 @ R1  # (M,3) rows xn1 R1 -> components (R1^T xn1)^T
        ray2 = xn2 @ R2
        cos_rays = np.einsum("mi,mi->m", ray1, ray2) / (
            np.linalg.norm(ray1, axis=1) * np.linalg.norm(ray2, axis=1)
        )
        b = cam.bf / cam.fx
        cos_st1 = np.where(st1, np.cos(2 * np.arctan2(b / 2, np.maximum(z1, 1e-6))), cos_rays + 1)
        cos_st2 = np.where(st2, np.cos(2 * np.arctan2(b / 2, np.maximum(z2, 1e-6))), cos_rays + 1)
        cos_stereo = np.minimum(cos_st1, cos_st2)

        use_dlt = (cos_rays < cos_stereo) & (cos_rays > 0) & (
            st1 | st2 | (cos_rays < 0.9998)
        )
        use_s1 = ~use_dlt & st1 & (cos_st1 < cos_st2)
        use_s2 = ~use_dlt & st2 & (cos_st2 <= cos_st1) & ~use_s1
        usable = use_dlt | use_s1 | use_s2
        from_mono = use_dlt

        pts0 = np.zeros((M, 3))
        # DLT (SVD on 4x4, :320-341) — batched over all DLT rows at once
        di = np.where(use_dlt)[0]
        if len(di):
            A = np.stack(
                [
                    xn1[di, 0, None] * T1[2] - T1[0],
                    xn1[di, 1, None] * T1[2] - T1[1],
                    xn2[di, 0, None] * T2[2] - T2[0],
                    xn2[di, 1, None] * T2[2] - T2[1],
                ],
                axis=1,
            )                                           # (n, 4, 4)
            _, _, Vt = np.linalg.svd(A)
            v = Vt[:, 3]                                # (n, 4)
            bad = np.abs(v[:, 3]) < 1e-12
            usable[di[bad]] = False
            vs = np.where(bad[:, None], 1.0, v[:, 3:4])
            pts0[di] = v[:, :3] / vs
        s1i = np.where(use_s1)[0]
        if len(s1i):
            pts0[s1i] = (xn1[s1i] * z1[s1i, None] - t1) @ R1
        s2i_ = np.where(use_s2)[0]
        if len(s2i_):
            pts0[s2i_] = (xn2[s2i_] * z2[s2i_, None] - t2) @ R2

        mi = np.where(usable)[0]
        if len(mi) == 0:
            return 0

        # candidate degenerate components: union of both features' candidates
        cand1 = w.kf_comp_cand[kf1][idx1]          # (M, K)
        cand2 = w.kf_comp_cand[kf2][idx2]
        cands = np.concatenate([cand1, cand2], axis=1)  # (M, 2K)
        deg = self.assoc._deg
        cands = np.where((cands >= 0) & deg[np.maximum(cands, 0)], cands, -1)

        obs1 = np.concatenate([uv1, ur1[:, None]], -1)
        obs2 = np.concatenate([uv2, ur2[:, None]], -1)
        s2i1 = sigma2_inv[oct1]
        # NOTE: reference uses sigma2_inv1 for both edges (:130-137)
        s2i2 = s2i1

        CK = cands.shape[1]
        flat_c = cands[mi].reshape(-1)
        n_flat = len(flat_c)
        from .association import bucket_size

        B = bucket_size(n_flat)

        def padb(a, fill=0.0):
            a = np.asarray(a)
            out = np.full((B,) + a.shape[1:], fill, a.dtype)
            out[:n_flat] = a
            return out

        safe_c = np.maximum(padb(flat_c, 0), 0)
        rep = lambda a: np.repeat(a[mi], CK, axis=0)
        x_opt, c1o, c2o, cso = point_solver.optimize_triangulation(
            self.cam,
            jnp.array(padb(rep(pts0)), jnp.float32),
            jnp.tile(jnp.array(q1, jnp.float32), (B, 1)),
            jnp.tile(jnp.array(t1, jnp.float32), (B, 1)),
            jnp.array(padb(rep(obs1)), jnp.float32),
            jnp.array(padb(rep(st1), False)),
            jnp.array(padb(rep(s2i1), 1.0), jnp.float32),
            jnp.tile(jnp.array(q2, jnp.float32), (B, 1)),
            jnp.tile(jnp.array(t2, jnp.float32), (B, 1)),
            jnp.array(padb(rep(obs2)), jnp.float32),
            jnp.array(padb(rep(st2), False)),
            jnp.array(padb(rep(s2i2), 1.0), jnp.float32),
            jnp.array(self.assoc._normal[safe_c], jnp.float32),
            jnp.array(self.assoc._means[safe_c], jnp.float32),
            tri_lambda2=cfg.loc.tri_lambda2,
            iters=cfg.loc.tri_opt_iters,
        )
        x_opt = np.asarray(x_opt)[:n_flat].reshape(len(mi), CK, 3)
        c1o = np.asarray(c1o)[:n_flat].reshape(len(mi), CK)
        c2o = np.asarray(c2o)[:n_flat].reshape(len(mi), CK)
        cso = np.asarray(cso)[:n_flat].reshape(len(mi), CK)

        th1 = np.where(st1[mi], 7.8, 5.991)[:, None]
        th2 = np.where(st2[mi], 7.8, 5.991)[:, None]
        ok = (flat_c.reshape(len(mi), CK) >= 0) & (c1o <= th1) & (c2o <= th2)
        if cfg.loc.tri_check_str_chi2:
            ok &= cso <= cfg.loc.tri_str_thresh * cfg.loc.tri_lambda2
        err_sum = np.where(ok, c1o + c2o, np.inf)
        best = np.argmin(err_sum, axis=1)
        has_str = np.isfinite(err_sum[np.arange(len(mi)), best])
        str_comp = np.where(
            has_str, cands[mi][np.arange(len(mi)), best], -1
        )
        pts = np.where(has_str[:, None], x_opt[np.arange(len(mi)), best], pts0[mi])

        # acceptance gates (:358-412): reprojection into both KFs + scale —
        # vectorized over all usable matches; only the map surgery for the
        # survivors stays a loop
        def reproj_ok(Rk, tk, uvk, urk, stk):
            pc = pts @ Rk.T + tk                       # (n, 3)
            z = pc[:, 2]
            zs = np.where(np.abs(z) < 1e-12, 1e-12, z)
            u = cam.fx * pc[:, 0] / zs + cam.cx
            v = cam.fy * pc[:, 1] / zs + cam.cy
            err = (u - uvk[:, 0]) ** 2 + (v - uvk[:, 1]) ** 2
            errs = err + (u - cam.bf / zs - urk) ** 2
            e = np.where(stk, errs, err)
            th = np.where(stk, 7.8, 5.991)
            # NOTE: the reference scales both gates by sigma2[kp1.octave]
            # (:371,:382 use kp1's octave even for kp2 — mirrored here)
            return (z > 0) & (e <= th * sigma2[oct1[mi]])

        ok_pt = reproj_ok(R1, t1, uv1[mi], ur1[mi], st1[mi])
        ok_pt &= reproj_ok(R2, t2, uv2[mi], ur2[mi], st2[mi])
        d1 = np.linalg.norm(pts - t1_wc, axis=1)
        d2 = np.linalg.norm(pts - t2_wc, axis=1)
        ok_pt &= (d1 >= 1e-9) & (d2 >= 1e-9)
        ratio_dist = d2 / np.maximum(d1, 1e-9)
        ratio_oct = sf[oct1[mi]] / sf[oct2[mi]]
        ok_pt &= (ratio_dist * ratio_factor >= ratio_oct) & (
            ratio_dist <= ratio_oct * ratio_factor
        )

        created = 0
        for j in np.where(ok_pt)[0]:
            m = mi[j]
            pt = pts[j]
            pid = w.alloc_point(pt, ref_kf=kf1, created_kf_idx=w.kf_frame_idx[kf1])
            if from_mono[m]:
                w.pt_type[pid] = (
                    ms.PT_FROM_TRI_MONO_GMM if has_str[j] else ms.PT_FROM_TRI_MONO
                )
            else:
                w.pt_type[pid] = (
                    ms.PT_FROM_TRI_STEREO_GMM if has_str[j] else ms.PT_FROM_TRI_STEREO
                )
            if has_str[j]:
                w.pt_assoc_comp[pid] = str_comp[j]
            w.add_observation(pid, kf1, int(idx1[m]))
            w.add_observation(pid, kf2, int(idx2[m]))
            w.compute_distinctive_descriptor(pid)
            w.update_normal_and_depth(pid)
            self.candidate_points.append(pid)
            created += 1
        return created

    # ------------------------------------------------------------------

    def search_in_neighbors(self) -> None:
        """Fuse duplicated landmarks with 1st+2nd ring covisible KFs
        (localization.cpp:154-223)."""
        w = self.world
        kf = self.curr_kf
        tgt = []
        seen = set()
        for kf1 in w.best_covisible(kf, 10):
            if kf1 in seen or not w.kf_valid[kf1]:
                continue
            seen.add(kf1)
            tgt.append(kf1)
            for kf2 in w.best_covisible(kf1, 5):
                if kf2 in seen or kf2 == kf or not w.kf_valid[kf2]:
                    continue
                seen.add(kf2)
                tgt.append(kf2)

        obs = w.kf_obs_point[kf]
        curr_pts = np.unique(obs[obs >= 0])
        for k in tgt:
            self._fuse(k, curr_pts)

        fuse_cand = []
        for k in tgt:
            o = w.kf_obs_point[k]
            for p in np.unique(o[o >= 0]):
                if w.pt_valid[p] and w.pt_fuse_tgt_kf[p] != w.kf_frame_idx[kf]:
                    w.pt_fuse_tgt_kf[p] = w.kf_frame_idx[kf]
                    fuse_cand.append(p)
        if fuse_cand:
            self._fuse(kf, np.array(fuse_cand))

        o = w.kf_obs_point[kf]
        upd = np.unique(o[o >= 0])
        for p in upd:
            if w.pt_valid[p]:
                w.compute_distinctive_descriptor(p)
        w.update_normal_and_depth_batch(upd)
        w.update_connections(kf)

    def _fuse(self, kf: int, pids: np.ndarray, th: float = 3.0) -> int:
        """Project points into kf, match, add/replace observations
        (localization.cpp fuseObservations:226-325)."""
        w = self.world
        cam = self.cam
        pids = pids[w.pt_valid[pids]]
        # skip points already observed by kf
        not_obs = np.array(
            [not (w.pt_obs_kf[p] == kf).any() for p in pids], dtype=bool
        ) if len(pids) else np.zeros(0, bool)
        pids = pids[not_obs]
        if len(pids) == 0:
            return 0

        R = ms._quat_to_mat(w.kf_q[kf])
        t = w.kf_t[kf]
        t_wc = -R.T @ t
        pos = w.pt_pos[pids]
        pc = pos @ R.T + t
        z = pc[:, 2]
        zs = np.where(np.abs(z) < 1e-9, 1e-9, z)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        ur = u - cam.bf / zs
        inside = (z > 0) & (u >= 0) & (v >= 0) & (u < cam.width) & (v < cam.height)

        vdir = pos - t_wc
        dist = np.linalg.norm(vdir, axis=-1)
        ok = inside & (dist >= 0.8 * w.pt_min_dist[pids]) & (
            dist <= 1.2 * w.pt_max_dist[pids]
        ) & (dist > 1e-9)
        vc = np.einsum("ni,ni->n", vdir, w.pt_normal[pids]) / np.clip(dist, 1e-9, None)
        ok &= vc >= 0.5
        lvl = np.ceil(
            np.log(np.clip(w.pt_max_dist[pids] / np.clip(dist, 1e-9, None), 1e-9, None))
            / w.pyr["log_scale_factor"]
        ).astype(np.int32)
        lvl = np.clip(lvl, 0, self.cfg.frame.num_levels - 1)

        pids, u, v, ur, lvl = pids[ok], u[ok], v[ok], ur[ok], lvl[ok]
        if len(pids) == 0:
            return 0
        sf = w.pyr["scale_factors"]
        # batched window/chi2/Hamming matching on device (fuse_match kernel);
        # only the map-surgery loop over the few winners stays on host
        from .association import bucket_size

        n = len(pids)
        B = bucket_size(n)

        def pad(a, fill, dtype):
            a = np.asarray(a)
            out = np.full((B,) + a.shape[1:], fill, dtype)
            out[:n] = a
            return out

        match = np.asarray(
            matching.fuse_match(
                jnp.array(pad(np.stack([u, v], -1), 0.0, np.float32)),
                jnp.array(pad(ur, -1.0, np.float32)),
                jnp.array(pad(w.pt_desc[pids], 0, np.uint8)),
                jnp.array(pad(lvl, 0, np.int32)),
                jnp.array(pad(th * sf[lvl], 1.0, np.float32)),
                jnp.array(pad(np.ones(n, bool), False, bool)),
                jnp.array(w.kf_feat_uv[kf], jnp.float32),
                jnp.array(w.kf_feat_ur[kf], jnp.float32),
                jnp.array(w.kf_feat_desc[kf]),
                jnp.array(w.kf_feat_octave[kf]),
                jnp.array(w.kf_feat_valid[kf]),
                jnp.array(w.pyr["sigma2_inv"], jnp.float32),
            )
        )[:n]
        num_fused = 0
        for j in np.where(match >= 0)[0]:
            p = pids[j]
            if not w.pt_valid[p]:
                continue
            ft = int(match[j])
            existing = w.kf_obs_point[kf, ft]
            if existing >= 0 and w.pt_valid[existing]:
                if w.pt_n_obs[existing] > w.pt_n_obs[p]:
                    w.replace_point(p, existing)
                else:
                    w.replace_point(existing, p)
            else:
                w.add_observation(p, kf, ft)
            num_fused += 1
        return num_fused

    # ------------------------------------------------------------------

    def joint_optimization(self) -> None:
        """Gather the local window, run the staged Schur BA, write back
        (localization_opt.cpp:456-925)."""
        w = self.world
        cfg = self.cfg
        caps = cfg.caps
        kf0 = self.curr_kf

        local = [kf0] + [int(k) for k in w.best_covisible(kf0)]
        local = [k for k in local if w.kf_valid[k]][: caps.local_ba_kfs]
        local_set = set(local)

        pts = set()
        for k in local:
            o = w.kf_obs_point[k]
            pts.update(o[o >= 0].tolist())
        pts = [p for p in pts if w.pt_valid[p]][: caps.local_ba_points]
        pt_slot = {p: i for i, p in enumerate(pts)}

        fixed = []
        fixed_set = set()
        for p in pts:
            kfs = w.pt_obs_kf[p]
            for k in kfs[kfs >= 0]:
                if k not in local_set and k not in fixed_set and w.kf_valid[k]:
                    fixed_set.add(int(k))
                    fixed.append(int(k))
        fixed = fixed[: caps.fixed_ba_kfs]
        fixed_set = set(fixed)

        # first map KF handling: prior if it's in the local set, else fixed.
        # The prior factor acts on camera SLOT 0, so the first KF must be
        # moved to the front of the local list when the prior is active.
        first_kf = w._kf_order[0] if w._kf_order else -1
        has_prior = cfg.loc.ba_first_as_prior and (first_kf in local_set)
        if has_prior:
            local.remove(first_kf)
            local.insert(0, first_kf)
        elif not cfg.loc.ba_first_as_prior and first_kf in local_set:
            local.remove(first_kf)
            fixed.insert(0, first_kf)
            fixed_set.add(first_kf)
            local_set.discard(first_kf)

        # GAUGE GUARD: a window with no fixed camera and no prior is
        # anchored only by the GMM plane factors, whose normals can be
        # near-parallel — the near-null gauge direction let whole windows
        # slide ~0.5m (observed r1). Hold the oldest local KF fixed then.
        if not fixed and not has_prior and len(local) > 1:
            oldest = min(local, key=lambda k: w.kf_frame_idx[k])
            local.remove(oldest)
            fixed.insert(0, oldest)
            fixed_set.add(oldest)
            local_set.discard(oldest)

        # tiered static shapes: small windows compile to small programs
        # (the padded worst-case BA costs ~4-8x more than early windows need)
        n_local = len(local)
        n_pts = len(pts)
        tiers = [(8, 16, 2048), (16, 32, 4096), (caps.local_ba_kfs, caps.fixed_ba_kfs, caps.local_ba_points)]
        for (tl, tf, tp) in tiers:
            if n_local <= tl and n_pts <= tp:
                L, F_CAP, P = tl, tf, tp
                break
        else:
            L, F_CAP, P = tiers[-1]
        C = L + F_CAP
        fixed = fixed[:F_CAP]
        fixed_set = set(fixed)

        cam_q = np.tile(np.array([1.0, 0, 0, 0]), (C, 1))
        cam_t = np.zeros((C, 3))
        cam_valid = np.zeros(C, bool)
        slot_of = {}
        for i, k in enumerate(local):
            cam_q[i], cam_t[i] = w.kf_q[k], w.kf_t[k]
            cam_valid[i] = True
            slot_of[k] = i
        for i, k in enumerate(fixed):
            cam_q[L + i], cam_t[L + i] = w.kf_q[k], w.kf_t[k]
            cam_valid[L + i] = True
            slot_of[k] = L + i

        pts_np = np.array(pts, np.int64)
        n_act = len(pts)
        pts_arr = np.zeros((P, 3))
        pt_valid = np.zeros(P, bool)
        str_type = np.zeros(P, np.int32)
        str_normal = np.zeros((P, 3))
        str_normal[:, 2] = 1.0
        str_mean = np.zeros((P, 3))
        str_sqrt = np.tile(np.eye(3), (P, 1, 1))
        deg = self.assoc._deg
        pts_arr[:n_act] = w.pt_pos[pts_np]
        pt_valid[:n_act] = True
        comp = w.pt_assoc_comp[pts_np]
        has_c = comp >= 0
        cs = np.maximum(comp, 0)
        is_deg = has_c & deg[cs]
        is_nd = has_c & ~deg[cs]
        str_type[:n_act] = np.where(
            is_deg, local_ba.STR_DEG, np.where(is_nd, local_ba.STR_NONDEG, 0)
        )
        str_normal[:n_act][is_deg] = self.assoc._normal[cs[is_deg]]
        str_mean[:n_act][has_c] = self.assoc._means[cs[has_c]]
        str_sqrt[:n_act][is_nd] = self.assoc._sqrt_info[cs[is_nd]]

        # per-point observation tables (the solver is gather/one-hot based —
        # TPU scatters serialize; see solver/local_ba.py). The world already
        # keeps (MP, MO_world) observation tables, so assembly is pure
        # vectorized gathering: map KF ids -> window slots, compact the
        # surviving observations to the first MO columns per row.
        MO = caps.ba_obs_per_point
        obs_cam = np.full((P, MO), -1, np.int32)
        obs_uvr = np.zeros((P, MO, 3), np.float32)
        obs_st = np.zeros((P, MO), bool)
        obs_s2i = np.ones((P, MO), np.float32)
        obs_valid = np.zeros((P, MO), bool)
        obs_kfid = np.full((P, MO), -1, np.int32)  # for post-BA obs erasure
        sigma2_inv = w.pyr["sigma2_inv"]
        slot_lut = np.full(w.MK, -1, np.int32)
        for k, s in slot_of.items():
            slot_lut[k] = s
        okf = w.pt_obs_kf[pts_np]                       # (n_act, MO_world)
        oslot = np.where(okf >= 0, slot_lut[np.maximum(okf, 0)], -1)
        use = (okf >= 0) & (oslot >= 0)
        order = np.argsort(~use, axis=1, kind="stable")[:, :MO]
        use_c = np.take_along_axis(use, order, axis=1)
        okf_c = np.where(use_c, np.take_along_axis(okf, order, axis=1), 0)
        oft_c = np.where(
            use_c, np.take_along_axis(w.pt_obs_feat[pts_np], order, axis=1), 0
        )
        obs_cam[:n_act] = np.where(
            use_c, np.take_along_axis(oslot, order, axis=1), -1
        )
        uv = w.kf_feat_uv[okf_c, oft_c]                 # (n_act, MO, 2)
        urr = w.kf_feat_ur[okf_c, oft_c]
        obs_uvr[:n_act] = np.concatenate([uv, urr[..., None]], -1)
        obs_st[:n_act] = use_c & (urr >= 0)
        obs_s2i[:n_act] = np.where(
            use_c, sigma2_inv[w.kf_feat_octave[okf_c, oft_c]], 1.0
        )
        obs_valid[:n_act] = use_c
        obs_kfid[:n_act] = np.where(use_c, okf_c, -1)
        obs_per_cam = np.bincount(
            obs_cam[:n_act][use_c].astype(np.int64), minlength=C
        )
        n_obs_pt = use_c.sum(1)
        self.ba_stats.append({
            "L": L, "P": P, "MO": MO,
            "n_local": n_local, "n_fixed": len(fixed), "n_pts": n_act,
            "obs_mean": float(n_obs_pt.mean()) if n_act else 0.0,
            "obs_p95": float(np.percentile(n_obs_pt, 95)) if n_act else 0.0,
            "obs_max_hit": int((n_obs_pt >= MO).sum()),
            "n_obs": int(n_obs_pt.sum()),
        })

        # A local KF with almost no surviving observations is effectively
        # unconstrained — optimizing it lets it wander (observed r1: culled
        # points left stale KFs that BA dragged ~0.5m, corrupting frames
        # anchored to them). Demote such KFs to fixed by zeroing their free
        # status via cam_valid masking in slot space.
        weak = (np.arange(C) < L) & cam_valid & (obs_per_cam < 10)
        if weak[0] and has_prior:
            weak[0] = False  # the prior-anchored first KF stays free
        cam_valid[weak] = False  # solver: invalid free slot == held fixed;
        # its observations still constrain points (obs_on_free masks only
        # the camera-side blocks).

        prob = local_ba.BAProblem(
            cam_q=jnp.array(cam_q, jnp.float32),
            cam_t=jnp.array(cam_t, jnp.float32),
            cam_valid=jnp.array(cam_valid),
            pts=jnp.array(pts_arr, jnp.float32),
            pt_valid=jnp.array(pt_valid),
            obs_cam=jnp.array(obs_cam),
            obs_uvr=jnp.array(obs_uvr),
            obs_stereo=jnp.array(obs_st),
            obs_sigma2_inv=jnp.array(obs_s2i),
            obs_valid=jnp.array(obs_valid),
            str_type=jnp.array(str_type),
            str_normal=jnp.array(str_normal, jnp.float32),
            str_mean=jnp.array(str_mean, jnp.float32),
            str_sqrt_info=jnp.array(str_sqrt, jnp.float32),
            prior_q=jnp.array(w.kf_q[first_kf] if first_kf >= 0 else cam_q[0], jnp.float32),
            prior_t=jnp.array(w.kf_t[first_kf] if first_kf >= 0 else cam_t[0], jnp.float32),
            has_prior=jnp.array(bool(has_prior)),
        )
        sig_rot = np.deg2rad(cfg.loc.prior_sigma_rot_deg)
        res = local_ba.solve_local_ba(
            self.cam,
            prob,
            n_free=L,
            ba_lambda2=cfg.loc.ba_lambda2,
            tri_str_thresh=cfg.loc.tri_str_thresh,
            prior_rot_info=1.0 / sig_rot**2,
            prior_trans_info=1.0 / cfg.loc.prior_sigma_trans**2,
            iters1=cfg.loc.ba_iters_stage1,
            iters2=cfg.loc.ba_iters_stage2,
            iters3=cfg.loc.ba_iters_stage3,
            term_gain=cfg.loc.ba_term_gain,
            schur_impl=cfg.loc.ba_schur_impl,
            linear_solver=cfg.loc.ba_linear_solver,
            cg_iters=cfg.loc.ba_cg_iters,
        )

        self.last_ba_iters = int(res.n_iters)

        # write back poses/points, rejecting implausible jumps: a local-BA
        # step that moves a keyframe by decimetres is divergence (gauge
        # slide / edge-deactivation runaway), not refinement — keep the
        # tracked pose in that case (observed r1: 0.5m slides corrupted
        # the anchored frame exports permanently).
        new_q = np.asarray(res.cam_q, np.float64)
        new_t = np.asarray(res.cam_t, np.float64)
        for i, k in enumerate(local):
            n = new_q[i] / np.linalg.norm(new_q[i])
            if np.linalg.norm(new_t[i] - w.kf_t[k]) > 0.3:
                continue
            w.kf_q[k], w.kf_t[k] = n, new_t[i]
        new_pts = np.asarray(res.pts, np.float64)
        w.pt_pos[pts_np] = new_pts[:n_act]

        # association downgrade (:837-855)
        drop = np.asarray(res.str_drop)[:n_act]
        dg_lut = np.arange(128, dtype=np.int16)
        for src, dst in ms.DOWNGRADE.items():
            dg_lut[src] = dst
        dgm = drop & np.isin(w.pt_type[pts_np], list(ms.DOWNGRADE.keys()))
        sel = pts_np[dgm]
        w.pt_type[sel] = dg_lut[w.pt_type[sel]].astype(w.pt_type.dtype)
        w.pt_assoc_comp[sel] = -1
        w.pt_assoc_vetted[sel] = False
        # associations that survived this BA pass are vetted for per-frame
        # pose anchoring (tracker._gather_anchors)
        keep = pts_np[w.pt_assoc_comp[pts_np] >= 0]
        w.pt_assoc_vetted[keep] = True

        # erase outlier observations (:857-894) — host surgery over the
        # (few) flagged entries only
        bad = np.asarray(res.obs_bad)[:n_act] & (obs_kfid[:n_act] >= 0)
        for i, oi in np.argwhere(bad):
            p = pts_np[i]
            if w.pt_valid[p]:
                if w.remove_observation(p, int(obs_kfid[i, oi])):
                    w.remove_point(p)
        w.update_normal_and_depth_batch(pts_np)

    # ------------------------------------------------------------------

    def remove_keyframes(self) -> None:
        """Cull redundant KFs (localization.cpp:334-397): >90% of near-depth
        points seen >=3 times elsewhere at same-or-finer scale."""
        w = self.world
        cfg = self.cfg
        th_depth = w.pyr["th_depth"]
        for kf in w.best_covisible(self.curr_kf):
            if w.kf_frame_idx[kf] == 0 or not w.kf_valid[kf]:
                continue
            obs = w.kf_obs_point[kf]
            d = w.kf_feat_depth[kf]
            near = (obs >= 0) & w.pt_valid[np.maximum(obs, 0)] & (d >= 0) & (
                d <= th_depth
            )
            pts = obs[near]
            num_mps = len(pts)
            if num_mps == 0:
                continue
            lvl = w.kf_feat_octave[kf, near]
            # count other-KF observations at same-or-one-coarser scale
            okf = w.pt_obs_kf[pts]                     # (n, MO_world)
            oft = np.maximum(w.pt_obs_feat[pts], 0)
            other = (okf >= 0) & (okf != kf)
            oct_other = w.kf_feat_octave[np.maximum(okf, 0), oft]
            n_obs = np.sum(other & (oct_other <= lvl[:, None] + 1), axis=1)
            redundant = (w.pt_n_obs[pts] > cfg.loc.cull_min_obs) & (
                n_obs >= cfg.loc.cull_min_obs
            )
            if redundant.sum() > cfg.loc.kf_cull_redundancy * num_mps:
                w.remove_keyframe(kf)
