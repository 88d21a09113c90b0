"""Dense-map stress benchmark: 10x GMM component count.

BASELINE.json stress config: "Dense GMM map stress: 10x component count +
relocalization via DBoW2 place recognition". Builds a 10x-dense map by
jittered replication of the real v1.gmm components and times the per-KF
association path (renderView + searchCorrespondence) at that scale,
single-device and sharded over the available mesh.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmloc_tpu.utils.tpuenv import ensure_fast_tpu_env

ensure_fast_tpu_env()

import jax
import jax.numpy as jnp
import numpy as np

from gmmloc_tpu.config import CameraConfig, euroc_v1_config
from gmmloc_tpu.geometry import camera as cam_mod
from gmmloc_tpu.gmm import mixture, render
from gmmloc_tpu.parallel import sharding
from gmmloc_tpu.utils import proto


def densify(means, covs, factor: int, seed: int = 0):
    """Replicate components with small jitter around their own covariance."""
    rng = np.random.default_rng(seed)
    out_m = [means]
    out_c = [covs]
    evals, evecs = np.linalg.eigh(covs)
    for _ in range(factor - 1):
        z = rng.standard_normal(means.shape) * np.sqrt(np.clip(evals, 0, None))
        jitter = np.einsum("kij,kj->ki", evecs, z)
        out_m.append(means + jitter * 0.5)
        out_c.append(covs * rng.uniform(0.5, 1.5, (len(covs), 1, 1)))
    return np.concatenate(out_m), np.concatenate(out_c)


def timeit(fn, *args, warmup=2, iters=10, iters_lo=2, wrap_jit=True):
    """Two-point slope with a transfer sync: block_until_ready acks at
    enqueue through the dev tunnel (see bench.py), so completion is
    proven by summing a leaf to host. wrap_jit=False for sharded calls
    (jax.set_mesh inside another jit is invalid) — those run on the
    virtual CPU mesh where block_until_ready is truthful."""
    if not wrap_jit:
        for _ in range(warmup):
            r = fn(*args)
        jax.block_until_ready(r)

        def run_nb(n):
            t0 = time.perf_counter()
            for _ in range(n):
                r = fn(*args)
            jax.block_until_ready(r)
            return time.perf_counter() - t0

        t_lo = run_nb(iters_lo)
        t_hi = run_nb(iters)
        return max((t_hi - t_lo) / max(1, iters - iters_lo), 1e-7)

    def reduced(*a):
        r = fn(*a)
        total = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "dtype"):
                total = total + jnp.sum(leaf.astype(jnp.float32))
        return total

    reduced_j = jax.jit(reduced)
    for _ in range(warmup):
        s = reduced_j(*args)
    float(np.asarray(s))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            s = reduced_j(*args)
        float(np.asarray(s))
        return time.perf_counter() - t0

    t_lo = run(iters_lo)
    t_hi = run(iters)
    return max((t_hi - t_lo) / max(1, iters - iters_lo), 1e-7)


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cam = cam_mod.CameraParams.from_config(CameraConfig())
    means, covs, _, _ = proto.load_gmm_file(
        "/root/reference/gmmloc_ros/data/map/v1.gmm"
    )
    means, covs = densify(means, covs, factor)
    K = len(means)
    pad = ((K + 255) // 256) * 256
    print(f"stress map: K={K} (pad {pad})")

    t0 = time.time()
    gmap = mixture.from_arrays(
        means, covs, pad_to=pad, neighbor_cap=16, neighbor_dist_thresh=2.5,
        build_neighbors=False,  # not exercised by this bench; O(K^2) at 33k
    )
    print(f"build: {time.time()-t0:.1f}s")

    q = jnp.array([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    rng = np.random.default_rng(0)
    feat_uv = jnp.array(
        rng.uniform([0, 0], [cam.width, cam.height], (1280, 2)), jnp.float32
    )
    fv = jnp.ones(1280, bool)

    t_render = timeit(lambda q_, t_: render.render_view(gmap, cam, q_, t_), q, t)
    r2d = render.render_view(gmap, cam, q, t)
    t_assoc = timeit(lambda r_, u_: render.search_correspondence(r_, u_, fv), r2d, feat_uv)
    print(f"single-device: render {t_render*1e3:.2f}ms assoc {t_assoc*1e3:.2f}ms")

    n_dev = len(jax.devices())
    if n_dev > 1:
        mesh = sharding.make_mesh(n_dev)
        gmap_sh = sharding.shard_gmm_map(gmap, mesh)
        t_r_sh = timeit(
            lambda: sharding.render_view_sharded(gmap_sh, cam, q, t, mesh),
            wrap_jit=False,
        )
        r_sh = sharding.render_view_sharded(gmap_sh, cam, q, t, mesh)
        t_a_sh = timeit(
            lambda: sharding.search_correspondence_sharded(r_sh, feat_uv, fv, mesh),
            wrap_jit=False,
        )
        print(
            f"{n_dev}-device sharded: render {t_r_sh*1e3:.2f}ms assoc {t_a_sh*1e3:.2f}ms "
            f"(speedup {t_render/t_r_sh:.2f}x / {t_assoc/t_a_sh:.2f}x)"
        )


if __name__ == "__main__":
    main()
