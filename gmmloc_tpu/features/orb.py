"""Oriented BRIEF descriptors: IC-angle + steered binary tests.

TPU-native replacement for the descriptor half of ORBextractor
(ref: /root/reference/gmmloc/src/cv/orb_extractor.cpp: IC_Angle:77-101,
computeOrbDescriptor:104-146). Differences by design:

  - the 256 binary test pairs are generated procedurally (seeded isotropic
    Gaussian sampling, sigma = patch/5, the original BRIEF recipe) instead
    of the hand-tuned bit_pattern_31 table. Descriptors are therefore NOT
    bit-compatible with OpenCV ORB — irrelevant here, since matching is
    always ours-vs-ours and no pretrained vocabulary asset exists
    (SURVEY.md §7 hard part 7).
  - patch reads are batched gathers over (keypoint, test) index grids, not
    per-keypoint pointer walks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15          # IC-angle circular patch radius (HALF_PATCH_SIZE)
N_TESTS = 256
PATTERN_SEED = 20200829  # fixed: descriptors must be stable across runs


def _make_pattern():
    """256 (p1, p2) test pairs, clipped to the 31x31 patch.

    BRIEF G-II sampling (Calonder et al.: p1 ~ N(0, sigma^2),
    p2 ~ N(p1, (sigma/2)^2)) — localized pairs compare nearby pixels,
    which measured 96.1%% match precision on the cv2-oracle fixture vs
    85.6%% for isotropic G-I pairs and 93.9%% for OpenCV's learned
    bit_pattern_31 (tests/test_cv_oracle.py; VERDICT r2 weak #5)."""
    rng = np.random.default_rng(PATTERN_SEED)
    sigma = 31 / 5.0
    p1 = rng.normal(0.0, sigma, size=(N_TESTS, 1, 2))
    p2 = p1 + rng.normal(0.0, sigma / 2.0, size=(N_TESTS, 1, 2))
    pts = np.concatenate([p1, p2], axis=1)
    return np.clip(pts, -PATCH_R, PATCH_R).astype(np.float32)


PATTERN = _make_pattern()

# circular u_max table for IC-angle (same recipe as orb_extractor.cpp:408-441)
_UMAX = np.zeros(PATCH_R + 1, np.int32)
for _v in range(PATCH_R + 1):
    _UMAX[_v] = int(np.round(np.sqrt(PATCH_R**2 - _v**2)))


def _circle_mask():
    ys, xs = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    return (np.abs(xs) <= _UMAX[np.abs(ys)]).astype(np.float32)


CIRCLE = _circle_mask()


@jax.jit
def gather_patches(img, uv):
    """Extract 31x31 patches at integer keypoint locations (N, 31, 31)."""
    h, w = img.shape
    ys = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), PATCH_R, h - PATCH_R - 1)
    xs = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), PATCH_R, w - PATCH_R - 1)
    dy = jnp.arange(-PATCH_R, PATCH_R + 1)
    dx = jnp.arange(-PATCH_R, PATCH_R + 1)
    yy = ys[:, None, None] + dy[None, :, None]
    xx = xs[:, None, None] + dx[None, None, :]
    return img[yy, xx]


@jax.jit
def ic_angle(img, uv):
    """Intensity-centroid orientation in degrees (IC_Angle, :77-101)."""
    patches = gather_patches(img, uv)              # (N,31,31)
    mask = jnp.asarray(CIRCLE)
    ys = jnp.arange(-PATCH_R, PATCH_R + 1, dtype=jnp.float32)[:, None]
    xs = jnp.arange(-PATCH_R, PATCH_R + 1, dtype=jnp.float32)[None, :]
    m01 = jnp.sum(patches * mask * ys, axis=(1, 2))
    m10 = jnp.sum(patches * mask * xs, axis=(1, 2))
    return jnp.degrees(jnp.arctan2(m01, m10)) % 360.0


@jax.jit
def ic_angle_atlas(atlas, uv, y_off, h_v, w_v):
    """IC-angle for keypoints across ALL pyramid levels.

    `atlas` stacks the (raw) level images vertically; per-keypoint
    (y_off, h_v, w_v) give its level's row offset and dimensions.
    Centers are clamped PATCH_R inside the level (same clip semantics
    as the per-level gather_patches path).

    Dense-map formulation: the per-keypoint 31x31 patch gather cost
    ~25 ns/element on TPU (2.5M random gathers = 63 ms/pair, the
    dominant front-end stage). The circular moments are instead
    computed for EVERY pixel via per-row windowed sums of two x-cumsum
    maps (window half-width UMAX[|dy|] per dy row — static slices that
    XLA fuses into elementwise passes), then gathered at the N keypoint
    centers (2 element gathers each). Values match the patch form up to
    f32 summation order; selected keypoints sit >= 16 px inside their
    level band, so no window crosses a band boundary."""
    ys = jnp.clip(
        jnp.round(uv[:, 1]).astype(jnp.int32),
        PATCH_R, h_v - PATCH_R - 1,
    ) + y_off
    xs = jnp.clip(
        jnp.round(uv[:, 0]).astype(jnp.int32), PATCH_R, w_v - PATCH_R - 1
    )
    H, W = atlas.shape
    PAD = PATCH_R + 1
    # prefix sums along x of I and x*I, padded so every static window
    # slice below stays in bounds (cumsum "C[x-1]" convention via a
    # leading zero column)
    x_coord = jnp.arange(W, dtype=jnp.float32)[None, :]
    C = jnp.cumsum(atlas, axis=1)
    C2 = jnp.cumsum(atlas * x_coord, axis=1)
    zpad = ((0, 0), (PAD + 1, PAD))
    Cp = jnp.pad(jnp.pad(C, ((0, 0), (1, 0))), zpad)     # C[x-1] lookup
    C2p = jnp.pad(jnp.pad(C2, ((0, 0), (1, 0))), zpad)

    umax = np.asarray(_UMAX)
    m01 = jnp.zeros((H, W), jnp.float32)
    m10 = jnp.zeros((H, W), jnp.float32)
    base = PAD + 1
    for dy in range(-PATCH_R, PATCH_R + 1):
        u = int(umax[abs(dy)])
        # row y+dy, clamped (clamped rows are only read by un-selectable
        # border keypoints; centers are interior by construction)
        if dy < 0:
            Crow = jnp.pad(Cp, ((-dy, 0), (0, 0)))[: H, :]
            C2row = jnp.pad(C2p, ((-dy, 0), (0, 0)))[: H, :]
        elif dy > 0:
            Crow = jnp.pad(Cp, ((0, dy), (0, 0)))[dy:, :]
            C2row = jnp.pad(C2p, ((0, dy), (0, 0)))[dy:, :]
        else:
            Crow, C2row = Cp, C2p
        # windowed sums over x' in [x-u, x+u]: C[x+u] - C[x-u-1]
        hi = base + u
        lo = base - u - 1
        winC = (
            jax.lax.slice_in_dim(Crow, hi, hi + W, axis=1)
            - jax.lax.slice_in_dim(Crow, lo, lo + W, axis=1)
        )
        winC2 = (
            jax.lax.slice_in_dim(C2row, hi, hi + W, axis=1)
            - jax.lax.slice_in_dim(C2row, lo, lo + W, axis=1)
        )
        m01 = m01 + float(dy) * winC
        m10 = m10 + (winC2 - x_coord * winC)
    m01_k = m01[ys, xs]
    m10_k = m10[ys, xs]
    return jnp.degrees(jnp.arctan2(m01_k, m10_k)) % 360.0


@jax.jit
def brief_descriptors_atlas(atlas_blur, uv, angle_deg, y_off, h_v, w_v):
    """Steered BRIEF-256 across ALL levels in one gather (atlas of the
    per-level BLURRED images; blur must not bleed across level
    boundaries, so levels are blurred before stacking). Clip semantics
    identical to the per-level brief_descriptors ([0, h-1]/[0, w-1] of
    the keypoint's own level)."""
    a = jnp.radians(angle_deg)
    ca, sa = jnp.cos(a), jnp.sin(a)
    pat = jnp.asarray(PATTERN)
    px = pat[None, :, :, 0] * ca[:, None, None] - pat[None, :, :, 1] * sa[:, None, None]
    py = pat[None, :, :, 0] * sa[:, None, None] + pat[None, :, :, 1] * ca[:, None, None]
    xs = jnp.clip(
        jnp.round(uv[:, None, None, 0] + px).astype(jnp.int32),
        0, (w_v - 1)[:, None, None],
    )
    ys = jnp.clip(
        jnp.round(uv[:, None, None, 1] + py).astype(jnp.int32),
        0, (h_v - 1)[:, None, None],
    ) + y_off[:, None, None]
    vals = atlas_blur[ys, xs]
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1
    ).astype(jnp.uint8)


@jax.jit
def brief_descriptors(img_blur, uv, angle_deg):
    """Steered BRIEF-256 -> (N, 32) uint8.

    Test points are rotated by the keypoint angle then read with nearest
    sampling from the blurred level image (computeOrbDescriptor:104-146).
    """
    h, w = img_blur.shape
    a = jnp.radians(angle_deg)
    ca, sa = jnp.cos(a), jnp.sin(a)
    pat = jnp.asarray(PATTERN)                     # (256,2,2) xy pairs

    # rotate: x' = x cos - y sin ; y' = x sin + y cos
    px = pat[None, :, :, 0] * ca[:, None, None] - pat[None, :, :, 1] * sa[:, None, None]
    py = pat[None, :, :, 0] * sa[:, None, None] + pat[None, :, :, 1] * ca[:, None, None]
    xs = jnp.clip(jnp.round(uv[:, None, None, 0] + px).astype(jnp.int32), 0, w - 1)
    ys = jnp.clip(jnp.round(uv[:, None, None, 1] + py).astype(jnp.int32), 0, h - 1)
    vals = img_blur[ys, xs]                        # (N,256,2)
    bits = (vals[:, :, 0] < vals[:, :, 1]).astype(jnp.uint8)  # (N,256)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(
        bits.reshape(-1, 32, 8) * weights[None, None, :], axis=-1
    ).astype(jnp.uint8)
