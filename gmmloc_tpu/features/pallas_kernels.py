"""Pallas TPU kernels for the matching hot path.

The dense Hamming-distance matrix is the innermost op of every matching
strategy (features/matching.py). The XLA formulation materializes the
(N, M, 32) XOR tensor in HBM; this Pallas kernel tiles it through VMEM
(one (TN, TM) block at a time), keeping the byte tensor on-chip.

Falls back to the XLA path on CPU (Pallas TPU lowering only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

TILE_N = 128
TILE_M = 128


def _hamming_kernel(a_ref, b_ref, out_ref):
    """Word-wise popcount: descriptors arrive as 8 x uint32 words; each
    step is a 2D (TILE_N, TILE_M) VPU op (tile-aligned, no 3D byte tensor).
    """
    acc = jnp.zeros((TILE_N, TILE_M), jnp.int32)
    for w in range(8):
        aw = a_ref[:, w][:, None]                 # (TILE_N, 1) uint32
        bw = b_ref[:, w][None, :]                 # (1, TILE_M)
        x = jax.lax.bitwise_xor(aw, bw)
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:] = acc


@jax.jit
def hamming_matrix_pallas(desc_a, desc_b):
    """(N,32)x(M,32) uint8 -> (N,M) int32 Hamming distances (TPU Pallas)."""
    N, M = desc_a.shape[0], desc_b.shape[0]
    pad_n = (-N) % TILE_N
    pad_m = (-M) % TILE_M
    a = jnp.pad(desc_a, ((0, pad_n), (0, 0)))
    b = jnp.pad(desc_b, ((0, pad_m), (0, 0)))
    Np, Mp = N + pad_n, M + pad_m
    # reinterpret 32 bytes as 8 little-endian uint32 words
    a32 = jax.lax.bitcast_convert_type(a.reshape(Np, 8, 4), jnp.uint32)
    b32 = jax.lax.bitcast_convert_type(b.reshape(Mp, 8, 4), jnp.uint32)

    grid = (Np // TILE_N, Mp // TILE_M)
    out = pl.pallas_call(
        _hamming_kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE_M, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_N, TILE_M), lambda i, j: (i, j)),
    )(a32, b32)
    return out[:N, :M]


def use_pallas() -> bool:
    return _HAS_PLTPU and jax.default_backend() not in ("cpu",)


def hamming_matrix(desc_a, desc_b):
    """Dispatch: Pallas on TPU, XLA elsewhere."""
    if use_pallas():
        return hamming_matrix_pallas(desc_a, desc_b)
    from . import matching

    return matching._hamming_matrix_xla(desc_a, desc_b)


# ---------------------------------------------------------------------
# FAST-16 corner score + 3x3 NMS, fused in VMEM.
#
# The XLA path (features/fast.py fast_score + nms3x3) materializes 16
# full-image shifted maps (plus arc intermediates) through HBM; this
# kernel streams row slabs through VMEM once and computes the segment
# test with a log-step circular window-min (4 doubling passes + 1),
# then the strict 3x3 NMS, in the same program.
# (ref behavior: orb_extractor.cpp:739-988 grid FAST with th 20->7.)

_FAST_BH = 64     # output rows per program
_FAST_HALO = 4    # ring radius 3 + 1 row of NMS context


def _roll2(x, sy, sx):
    """Static circular shift equivalent to jnp.roll(x, (-sy, -sx))."""
    if sy:
        s = sy % x.shape[0]
        x = jnp.concatenate([x[s:], x[:s]], axis=0)
    if sx:
        s = sx % x.shape[1]
        x = jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
    return x


def _fast_nms_kernel(th_low, ring, h_true, w_true, img_ref, out_ref):
    i = pl.program_id(0)
    bh, halo = _FAST_BH, _FAST_HALO
    slab = img_ref[pl.ds(i * bh, bh + 2 * halo), :]   # (BH+8, Wp)

    d = [_roll2(slab, int(dy), int(dx)) - slab for dy, dx in ring]

    def window_min9(v):
        # min over the circular window v[s..s+8] (9 long): doubling to 8
        # (m1: 2, m2: 4, m4: 8) then one extra element at s+8
        m1 = [jnp.minimum(v[s], v[(s + 1) % 16]) for s in range(16)]
        m2 = [jnp.minimum(m1[s], m1[(s + 2) % 16]) for s in range(16)]
        m4 = [jnp.minimum(m2[s], m2[(s + 4) % 16]) for s in range(16)]
        m9 = [jnp.minimum(m4[s], v[(s + 8) % 16]) for s in range(16)]
        out = m9[0]
        for s in range(1, 16):
            out = jnp.maximum(out, m9[s])
        return out

    mb = window_min9(d)
    md = window_min9([-x for x in d])
    score = jnp.maximum(
        jnp.where(mb > th_low, mb, 0.0), jnp.where(md > th_low, md, 0.0)
    )

    # border zeroing in GLOBAL image coordinates (3 px, as fast_score)
    rows = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 0) + i * bh - halo
    cols = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1)
    border = (
        (rows >= 3) & (rows < h_true - 3) & (cols >= 3) & (cols < w_true - 3)
    )
    score = jnp.where(border, score, 0.0)

    # strict 3x3 NMS (matches fast.nms3x3 semantics)
    neigh = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = _roll2(score, dy, dx)
            neigh = n if neigh is None else jnp.maximum(neigh, n)
    nms = jnp.where(score >= neigh + 1e-6, score, 0.0)

    out_ref[:] = nms[halo : halo + bh, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms_pallas(img, interpret: bool = False):
    """FAST corner score + 3x3 NMS in one Pallas dispatch.

    img: (H, W) float32. Returns (H, W) float32 NMS'd scores, equal to
    fast.nms3x3(fast.fast_score(img)) away from circular-wrap edges
    (both are zeroed inside the 3 px border either way).
    """
    from . import fast as fast_mod

    h, w = img.shape
    bh, halo = _FAST_BH, _FAST_HALO
    n_blocks = -(-h // bh)
    hp = n_blocks * bh
    wp = -(-w // 128) * 128
    padded = jnp.zeros((hp + 2 * halo, wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (halo, 0))

    kern = functools.partial(
        _fast_nms_kernel, float(fast_mod.FAST_TH_LOW),
        tuple(map(tuple, fast_mod.RING)), h, w,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.float32),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM if _HAS_PLTPU else None)],
        out_specs=pl.BlockSpec((bh, wp), lambda i: (i, 0)),
        interpret=interpret,
    )(padded)
    return out[:h, :w]


def fast_score_nms(img):
    """Dispatch: fused Pallas kernel on TPU, XLA ops elsewhere."""
    from . import fast as fast_mod

    if use_pallas():
        return fast_score_nms_pallas(img)
    return fast_mod.nms3x3(fast_mod.fast_score(img))
