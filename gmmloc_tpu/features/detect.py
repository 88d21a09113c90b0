"""Full ORB-style detection pipeline over the image pyramid.

TPU-native replacement for ORBextractor::detect
(ref: /root/reference/gmmloc/src/cv/orb_extractor.cpp:988-1054):
pyramid -> per-level FAST + per-cell distribution -> IC-angle ->
blur -> steered BRIEF; keypoints scaled back to level-0 coordinates.

The per-level quotas follow the reference's geometric split
(:418-434): n_l ∝ (1/1.2)^l, remainder to the coarsest level.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast, orb, pyramid


class Detections(NamedTuple):
    uv: jax.Array       # (N,2) level-0 pixel coords
    octave: jax.Array   # (N,) int32
    angle: jax.Array    # (N,) degrees
    response: jax.Array  # (N,)
    desc: jax.Array     # (N,32) uint8
    valid: jax.Array    # (N,) bool


def level_quotas(num_features: int, num_levels: int, scale: float):
    inv = 1.0 / scale
    factor = num_features * (1 - inv) / (1 - inv**num_levels)
    quotas = [int(round(factor * inv**l)) for l in range(num_levels - 1)]
    quotas.append(max(0, num_features - sum(quotas)))
    return quotas


class ORBDetector:
    """Builds one jitted detect() for a fixed image geometry."""

    def __init__(self, height: int, width: int, num_features: int = 1200,
                 num_levels: int = 8, scale: float = 1.2, cell: int = 24,
                 use_pallas_fast: bool = True):
        self.shapes = tuple(pyramid.level_shapes(height, width, num_levels, scale))
        self.quotas = level_quotas(num_features, num_levels, scale)
        self.num_levels = num_levels
        self.scale_factors = scale ** np.arange(num_levels)
        self.cell = cell
        # fused Pallas FAST+NMS (pallas_kernels.fast_score_nms): validated
        # on-chip bit-exact vs the XLA path, 3.4x faster standalone
        # (0.058 vs 0.200 ms @ 480x752), and composes inside this
        # multi-level jit without wedging the executor. Falls back to XLA
        # on CPU automatically.
        self.use_pallas_fast = use_pallas_fast
        self._detect = jax.jit(self._detect_impl)

    def _detect_impl(self, img):
        levels = pyramid.build_pyramid(img, self.shapes)
        return self.detect_from_levels(levels)

    def detect_from_levels(self, levels):
        """Detection given a prebuilt pyramid (lets a caller share ONE
        pyramid between detection and stereo refinement inside a single
        fused jit — frontend.process_packed)."""
        uvs, octs, angs, resps, descs, valids = [], [], [], [], [], []
        for l, lvl_img in enumerate(levels):
            if self.use_pallas_fast:
                from . import pallas_kernels as pk

                score = pk.fast_score_nms(lvl_img)
            else:
                score = fast.nms3x3(fast.fast_score(lvl_img))
            uv, resp, valid = fast.select_keypoints(
                score, cell=self.cell, quota=self.quotas[l], edge=16
            )
            ang = orb.ic_angle(lvl_img, uv)
            blur = pyramid.gaussian_blur7(lvl_img)
            desc = orb.brief_descriptors(blur, uv, ang)
            sf = self.scale_factors[l]
            uvs.append(uv * sf)
            octs.append(jnp.full(uv.shape[0], l, jnp.int32))
            angs.append(ang)
            resps.append(resp)
            descs.append(desc)
            valids.append(valid)
        return Detections(
            uv=jnp.concatenate(uvs),
            octave=jnp.concatenate(octs),
            angle=jnp.concatenate(angs),
            response=jnp.concatenate(resps),
            desc=jnp.concatenate(descs),
            valid=jnp.concatenate(valids),
        )

    def __call__(self, img) -> Detections:
        """img: (H,W) float32 [0,255]."""
        return self._detect(img)
