"""Image-level synthetic rendering: sprite worlds for the ORB front-end.

Renders stereo image pairs of a landmark sprite world along GT
trajectories so the FULL pipeline (pyramid/FAST/BRIEF/stereo matching ->
tracking -> mapping) can be exercised end-to-end without the EuRoC image
assets. Landmarks are drawn as Gaussian intensity blobs with per-landmark
contrast/size (stable appearance -> repeatable detections + descriptors).
"""

from __future__ import annotations

import numpy as np

from ..config import SystemConfig
from ..geometry import camera as cam_mod
from ..mapping.map_state import _quat_to_mat
from .synthetic import SyntheticWorld


class SpriteRenderer:
    def __init__(self, world: SyntheticWorld, cfg: SystemConfig, seed: int = 0,
                 bg: float = 40.0):
        self.world = world
        self.cfg = cfg
        self.cam = cam_mod.CameraParams.from_config(cfg.camera)
        rng = np.random.default_rng(seed)
        n = len(world.landmarks)
        sign = np.where(rng.random(n) < 0.5, -1.0, 1.0)
        self.contrast = rng.uniform(60, 170, n) * sign
        self.size_m = rng.uniform(0.010, 0.03, n)  # physical sprite radius
        self.bg = bg

    def render(self, q_wc, t_wc, right: bool = False) -> np.ndarray:
        cam = self.cam
        R_cw = _quat_to_mat(q_wc).T
        t_cw = -R_cw @ np.asarray(t_wc)
        if right:
            # right camera displaced by +baseline along camera x
            t_cw = t_cw - np.array([cam.bf / cam.fx, 0.0, 0.0])
        pc = self.world.landmarks @ R_cw.T + t_cw
        z = pc[:, 2]
        vis = z > 0.3
        zs = np.where(vis, z, 1.0)
        u = cam.fx * pc[:, 0] / zs + cam.cx
        v = cam.fy * pc[:, 1] / zs + cam.cy
        # projected sprite radius in px
        r_px = self.size_m * cam.fx / zs
        vis &= (u > -10) & (u < cam.width + 10) & (v > -10) & (v < cam.height + 10)
        vis &= r_px > 0.6

        img = np.full((cam.height, cam.width), self.bg, np.float32)
        # painter's algorithm far-to-near so near sprites overwrite
        order = np.argsort(-z)
        for i in order:
            if not vis[i]:
                continue
            rr = max(2, int(3 * r_px[i]))
            x0 = int(u[i]) - rr
            x1 = int(u[i]) + rr + 1
            y0 = int(v[i]) - rr
            y1 = int(v[i]) + rr + 1
            xa, xb = max(0, x0), min(cam.width, x1)
            ya, yb = max(0, y0), min(cam.height, y1)
            if xa >= xb or ya >= yb:
                continue
            ys = np.arange(ya, yb)[:, None] - v[i]
            xs = np.arange(xa, xb)[None, :] - u[i]
            s = max(r_px[i], 0.8)
            blob = self.contrast[i] * np.exp(-(ys**2 + xs**2) / (2 * s * s))
            img[ya:yb, xa:xb] += blob.astype(np.float32)
        return np.clip(img, 0.0, 255.0)

    def render_stereo(self, q_wc, t_wc):
        return self.render(q_wc, t_wc, False), self.render(q_wc, t_wc, True)
