"""Dump HLO collective statistics for the sharded BA + association path.

VERDICT r4 weak #8 / next-step #5: the >=0.76 multi-chip BA scaling
claim rests on an ICI cost model (expr_prof/roofline_r4.json); this tool
makes the model's inputs MEASURED compiler facts — it compiles the
production-shape sharded programs on the 8-device virtual mesh and
extracts every collective op (kind, element type, shape, bytes, replica
groups) from the optimized HLO, so the per-LM-iteration psum traffic
the model assumes can be checked against what XLA actually emits.

Usage:  python tools/collect_collectives.py [--n 8]
        [--out expr_prof/collectives_r5.json]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def _shape_bytes(shape_str: str) -> int:
    """'f32[48,6,6]' -> bytes. Tuple shapes handled by summing parts."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collect(hlo_text: str):
    ops = []
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?\S+ = (\(?[^)]*\)?[^ ]*) (\S+?)\(", ls)
        if not m:
            continue
        kind = m.group(2).rstrip(".0123456789")
        # normalize fusion-start forms like all-reduce-start
        base = kind.replace("-start", "").replace("-done", "")
        if base not in _COLLECTIVES:
            continue
        if kind.endswith("-done"):
            continue  # count start/done pairs once
        shape = m.group(1)
        rg = re.search(r"replica_groups=(\{[^}]*\}+|\[[^\]]*\]\S*)", ls)
        ops.append({
            "op": base,
            "shape": shape,
            "bytes": _shape_bytes(shape),
            "replica_groups": rg.group(1)[:160] if rg else None,
        })
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default="expr_prof/collectives_r5.json")
    args = ap.parse_args()

    jax.config.update("jax_num_cpu_devices", args.n)
    import numpy as np

    from gmmloc_tpu.config import CameraConfig, euroc_v1_config
    from gmmloc_tpu.geometry import camera as cam_mod, se3
    from gmmloc_tpu.gmm import mixture, render
    from gmmloc_tpu.parallel import sharding
    from gmmloc_tpu.solver import local_ba
    import jax.numpy as jnp

    mesh = sharding.make_mesh(args.n)
    cam = cam_mod.CameraParams.from_config(CameraConfig())
    cfg = euroc_v1_config()
    rng = np.random.default_rng(0)
    report = {"n_devices": args.n, "phases": {}}

    # ---- association phase (components sharded over the mesh) -----------
    K = 3328
    means = np.stack(
        [rng.uniform(-4, 4, K), rng.uniform(-3, 3, K), rng.uniform(3, 9, K)],
        -1,
    )
    covs = np.tile(np.diag([0.04, 0.04, 1e-6]), (K, 1, 1))
    gmap = mixture.from_arrays(means, covs, pad_to=K, build_neighbors=False)
    gmap_sh = sharding.shard_gmm_map(gmap, mesh)

    F = cfg.frame.feat_cap
    feat_uv = jnp.array(
        rng.uniform([0, 0], [cam.width, cam.height], (F, 2)), jnp.float32
    )
    # render_view / search_correspondence are already jitted — lower them
    # under the mesh so GSPMD partitions and emits the collectives
    with jax.set_mesh(mesh):
        low_rv = render.render_view.lower(
            gmap_sh, cam, se3.quat_identity(), jnp.zeros(3)
        )
        r2d = sharding.render_view_sharded(
            gmap_sh, cam, se3.quat_identity(), jnp.zeros(3), mesh
        )
        low_sc = render.search_correspondence.lower(
            r2d, feat_uv, jnp.ones(F, bool)
        )
    ops = collect(low_rv.compile().as_text()) + collect(
        low_sc.compile().as_text()
    )
    report["phases"]["association"] = {
        "collective_count": len(ops),
        "collective_bytes": sum(o["bytes"] for o in ops),
        "ops": ops,
    }

    # ---- BA phase: production tier, FULL 5/5/40 staged schedule ---------
    L, C, Pn, MO = 16, 48, 8192, cfg.caps.ba_obs_per_point
    cam_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (C, 1))
    cam_t = np.zeros((C, 3), np.float32)
    cam_t[:, 0] = np.arange(C) * 0.1
    pts = np.stack(
        [rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn),
         rng.uniform(4, 8, Pn)], -1,
    ).astype(np.float32)
    obs_cam = rng.integers(0, C, (Pn, MO)).astype(np.int32)
    pc = pts[:, None, :] + cam_t[obs_cam]
    uvr = np.stack(
        [
            cam.fx * pc[..., 0] / pc[..., 2] + cam.cx,
            cam.fy * pc[..., 1] / pc[..., 2] + cam.cy,
            cam.fx * pc[..., 0] / pc[..., 2] + cam.cx - cam.bf / pc[..., 2],
        ],
        -1,
    ).astype(np.float32)
    prob = local_ba.BAProblem(
        cam_q=jnp.array(cam_q), cam_t=jnp.array(cam_t),
        cam_valid=jnp.ones(C, bool),
        pts=jnp.array(pts), pt_valid=jnp.ones(Pn, bool),
        obs_cam=jnp.array(obs_cam), obs_uvr=jnp.array(uvr),
        obs_stereo=jnp.ones((Pn, MO), bool),
        obs_sigma2_inv=jnp.ones((Pn, MO), jnp.float32),
        obs_valid=jnp.ones((Pn, MO), bool),
        str_type=jnp.full(Pn, local_ba.STR_DEG, jnp.int32),
        str_normal=jnp.tile(jnp.array([0.0, 0, 1], jnp.float32), (Pn, 1)),
        str_mean=jnp.array(pts),
        str_sqrt_info=jnp.tile(jnp.eye(3, dtype=jnp.float32), (Pn, 1, 1)),
        prior_q=jnp.array(cam_q[0]), prior_t=jnp.array(cam_t[0]),
        has_prior=jnp.array(True),
    )
    prob_sh = sharding.shard_ba_problem(prob, mesh)

    with jax.set_mesh(mesh):
        lowered = local_ba.solve_local_ba.lower(
            cam, prob_sh, n_free=L, iters1=5, iters2=5, iters3=40,
            schur_impl=cfg.loc.ba_schur_impl,
        )
    hlo = lowered.compile().as_text()
    ops = collect(hlo)
    # per-LM-iteration view: the schedule runs 50 LM iterations; static
    # collectives inside the scan body appear once in HLO but execute
    # per iteration — report both raw HLO counts and the loop-aware note
    report["phases"]["ba_5_5_40"] = {
        "collective_count": len(ops),
        "collective_bytes": sum(o["bytes"] for o in ops),
        "ops": ops,
        "note": (
            "counts are static HLO ops; collectives inside the LM scan "
            "body execute once per iteration (50 total across stages)"
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        p: {"count": v["collective_count"], "bytes": v["collective_bytes"]}
        for p, v in report["phases"].items()
    }))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
