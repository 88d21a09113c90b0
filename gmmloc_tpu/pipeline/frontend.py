"""Image-level front-end: stereo images -> Frame.

TPU-native replacement for the per-frame image block of
GMMLoc::processFrame (ref: /root/reference/gmmloc/src/gmmloc.cpp:199-267):
rectify -> equalize -> dual ORB extraction (the reference's two ephemeral
threads become one batched device program per image) -> stereo matching ->
Frame assembly. All hot work is jitted; the host only reshapes outputs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..features import detect, pyramid, stereo
from ..tracking.frame import Frame, make_frame
from .rectify import Rectifier, equalize_hist


class ImageFrontend:
    def __init__(self, cfg: SystemConfig, rectifier: Optional[Rectifier] = None):
        self.cfg = cfg
        self.rect = rectifier
        cam = cfg.camera
        self.detector = detect.ORBDetector(
            cam.height, cam.width,
            num_features=cfg.frame.num_features,
            num_levels=cfg.frame.num_levels,
            scale=cfg.frame.scale_factor,
        )
        self.scale_factors = cfg.frame.scale_factors().astype(np.float32)
        self.baseline = cam.bf / cam.fx
        self.bf = cam.bf

    def process(self, idx: int, timestamp: float, left, right) -> Frame:
        cfg = self.cfg
        left = jnp.asarray(left, jnp.float32)
        right = jnp.asarray(right, jnp.float32)
        if cfg.camera.do_rectify and self.rect is not None:
            left = self.rect.rectify_left(left)
            right = self.rect.rectify_right(right)
        if cfg.camera.do_equalization:
            left = equalize_hist(left)
            right = equalize_hist(right)

        det_l = self.detector(left)
        det_r = self.detector(right)

        pyr_l = pyramid.build_pyramid(left, self.detector.shapes)
        pyr_r = pyramid.build_pyramid(right, self.detector.shapes)
        u_right, depth = stereo.compute_stereo_matches(
            pyr_l, pyr_r,
            det_l.uv, det_l.octave, det_l.desc, det_l.valid,
            det_r.uv, det_r.octave, det_r.desc, det_r.valid,
            self.scale_factors, bf=self.bf, baseline=self.baseline,
            n_levels=cfg.frame.num_levels,
        )

        valid = np.asarray(det_l.valid)
        n = len(valid)
        frame = make_frame(
            idx, timestamp,
            np.asarray(det_l.uv),
            np.asarray(u_right),
            np.asarray(depth),
            np.asarray(det_l.octave),
            np.asarray(det_l.angle),
            np.asarray(det_l.desc),
            max(cfg.frame.feat_cap, n),
        )
        frame.valid[:n] = valid
        return frame
