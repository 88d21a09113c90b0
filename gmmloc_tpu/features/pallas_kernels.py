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
