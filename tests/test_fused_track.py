"""Fused track-step megakernel test: recovers pose in one dispatch."""

import jax.numpy as jnp
import numpy as np

from gmmloc_tpu.config import CameraConfig, euroc_v1_config
from gmmloc_tpu.geometry import camera as cam_mod, se3
from gmmloc_tpu.tracking import fused

CAM = cam_mod.CameraParams.from_config(CameraConfig())


def test_fused_track_step_recovers_pose(rng):
    cfg = euroc_v1_config()
    F, P = 512, 1024
    # world points visible from identity
    uv = rng.uniform([40, 40], [CAM.width - 40, CAM.height - 40], (P, 2))
    z = rng.uniform(2.0, 10.0, P)
    pts = np.stack(
        [(uv[:, 0] - CAM.cx) / CAM.fx * z, (uv[:, 1] - CAM.cy) / CAM.fy * z, z], -1
    )
    desc = rng.integers(0, 256, (P, 32), dtype=np.uint8)

    # GT pose: small offset from identity
    q_gt, t_gt = se3.exp(jnp.array([0.004, -0.003, 0.002, 0.02, 0.01, -0.015]))
    pc = se3.apply(q_gt, t_gt, jnp.array(pts))
    uvr, vis = cam_mod.project_stereo(CAM, pc)
    vis = np.asarray(vis)
    sel = np.where(vis)[0][:F]

    feat_uv = np.asarray(uvr)[sel, :2] + rng.standard_normal((len(sel), 2)) * 0.2
    feat_ur = np.asarray(uvr)[sel, 2]
    feat_desc = desc[sel]
    n = len(sel)

    def pad(a, fill, shape1=()):
        out = np.full((F,) + shape1, fill, np.asarray(a).dtype)
        out[:n] = a
        return out

    sf = cfg.frame.scale_factors().astype(np.float32)
    # last-frame = the same landmarks seen from identity (queries)
    last_uvr, _ = cam_mod.project_stereo(CAM, jnp.array(pts))
    last_pts = pts[sel]
    res = fused.fused_track_step(
        CAM,
        se3.quat_identity(), jnp.zeros(3),
        jnp.array(pad(last_pts, 0.0, (3,)), jnp.float32),
        jnp.array(pad(feat_desc, 0, (32,))),
        jnp.zeros(F, jnp.int32),
        jnp.zeros(F, jnp.float32),
        jnp.array(pad(np.asarray(last_uvr)[sel, 2], -1.0), jnp.float32),
        jnp.array(pad(np.ones(n, bool), False)),
        jnp.array(pad(feat_uv, 0.0, (2,)), jnp.float32),
        jnp.array(pad(feat_ur, -1.0), jnp.float32),
        jnp.array(pad(feat_desc, 0, (32,))),
        jnp.zeros(F, jnp.int32),
        jnp.zeros(F, jnp.float32),
        jnp.array(pad(np.ones(n, bool), False)),
        jnp.ones(F, jnp.float32),
        # local map = all landmarks
        jnp.array(pts, jnp.float32),
        jnp.array(desc),
        jnp.array(-pts / np.linalg.norm(pts, axis=1, keepdims=True), jnp.float32),
        jnp.array(z * 0.3, jnp.float32),
        jnp.array(z * 3.0, jnp.float32),
        jnp.ones(P, bool),
        jnp.array(sf),
        float(np.log(1.2)),
        8,
    )
    err = se3.log(*se3.compose(*se3.inverse(q_gt, t_gt), res.q, res.t))
    assert float(jnp.linalg.norm(err)) < 2e-3, np.asarray(err)
    assert int(res.num_inliers) > 0.8 * n
