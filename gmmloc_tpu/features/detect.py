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
        fused jit — frontend.process_packed).

        Orientation + descriptors run as ONE atlas gather across all
        levels (orb.ic_angle_atlas / brief_descriptors_atlas) instead
        of 8 per-level gathers each — the patch gathers were the
        dominant cost of the fused front-end after the SAD-refine
        rewrite. Blur is applied per level BEFORE stacking so it cannot
        bleed across level boundaries; results are bit-identical to the
        per-level path (same clip semantics)."""
        uvs_lvl, octs, resps, valids = [], [], [], []
        for l, lvl_img in enumerate(levels):
            if self.use_pallas_fast:
                from . import pallas_kernels as pk

                score = pk.fast_score_nms(lvl_img)
            else:
                score = fast.nms3x3(fast.fast_score(lvl_img))
            uv, resp, valid = fast.select_keypoints(
                score, cell=self.cell, quota=self.quotas[l], edge=16
            )
            uvs_lvl.append(uv)
            octs.append(jnp.full(uv.shape[0], l, jnp.int32))
            resps.append(resp)
            valids.append(valid)

        heights = [im.shape[0] for im in levels]
        widths = [im.shape[1] for im in levels]
        offs = [0]
        for h in heights[:-1]:
            offs.append(offs[-1] + h)
        H_tot, W0 = offs[-1] + heights[-1], widths[0]
        atlas_raw = jnp.zeros((H_tot, W0), levels[0].dtype)
        atlas_blur = jnp.zeros((H_tot, W0), levels[0].dtype)
        for l, im in enumerate(levels):
            atlas_raw = jax.lax.dynamic_update_slice(atlas_raw, im, (offs[l], 0))
            atlas_blur = jax.lax.dynamic_update_slice(
                atlas_blur, pyramid.gaussian_blur7(im), (offs[l], 0)
            )

        uv_all = jnp.concatenate(uvs_lvl)                 # level-local coords
        octave = jnp.concatenate(octs)
        y_off = jnp.asarray(offs, jnp.int32)[octave]
        h_v = jnp.asarray(heights, jnp.int32)[octave]
        w_v = jnp.asarray(widths, jnp.int32)[octave]
        ang = orb.ic_angle_atlas(atlas_raw, uv_all, y_off, h_v, w_v)
        desc = orb.brief_descriptors_atlas(
            atlas_blur, uv_all, ang, y_off, h_v, w_v
        )
        sf = jnp.asarray(self.scale_factors, uv_all.dtype)[octave]
        return Detections(
            uv=uv_all * sf[:, None],
            octave=octave,
            angle=ang,
            response=jnp.concatenate(resps),
            desc=desc,
            valid=jnp.concatenate(valids),
        )

    def __call__(self, img) -> Detections:
        """img: (H,W) float32 [0,255]."""
        return self._detect(img)
