"""Benchmark: tracked frames/sec/chip through the REAL pipeline.

Prints ONE JSON line:
  {"metric": "tracked_frames_per_sec_chip", "value": N, "unit": "fps",
   "vs_baseline": N / 20.0}

FROZEN HEADLINE DEFINITION (r4; VERDICT r3 weak #6 — no more churn):
mean end-to-end tracked frames/sec through GMMLocSystem.step on the
synthetic feature path at the reference workload scale (1280
features/frame, real v1.gmm map, 752x480 geometry), in the PRODUCTION
operating configuration: online threaded mapping + device-chained
pipeline_depth=4 — the reference's own two-thread operating point
(gmmloc.cpp:56-59, ros::Rate(20)). p50/p95 frame times are reported
alongside, plus a second e2e line for the OFFLINE single-thread
protocol configuration (the accuracy/ATE-artifact config, comparable
with the BENCH_r02/r03 series) and an image-front-end fps line.

The baseline divisor is the reference's 20 Hz camera-rate operating
point (cfg/v1.yaml fps: 20) — the repo publishes no faster number
(BASELINE.md).

The e2e measurements run in child processes that append one line per
completed frame; if the development TPU tunnel wedges mid-run, the
parent kills the child and computes fps from the frames that DID
complete.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gmmloc_tpu.utils.tpuenv import ensure_fast_tpu_env, fast_tpu_child_env

if __name__ == "__main__":
    # terminal-side compile: first execution of each new executable is
    # ~0.5s instead of 2-5 min through the dev tunnel (utils/tpuenv.py)
    ensure_fast_tpu_env()

import numpy as np


def _reduced(fn):
    """Wrap fn(*args) so its outputs are reduced to ONE scalar inside the
    same jit, with the runtime inputs as REAL jit arguments.

    Two development-tunnel quirks force the scalar shape: block_until_ready
    acks at enqueue (not completion), and transfers of arrays produced by a
    CHAINED dispatch hang intermittently. A scalar that is the direct
    output of the single measured dispatch transfers reliably and its
    arrival proves the computation ran. Inputs must be jit ARGUMENTS, not
    closure constants — XLA constant-folds nullary graphs (observed: a
    closure-captured association pass "measured" at 0.1ms because the
    whole computation folded at compile time).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*args):
        r = fn(*args)
        total = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(r):
            if hasattr(leaf, "dtype"):
                total = total + jnp.sum(leaf.astype(jnp.float32))
        return total

    return wrapped


def timeit(fn, *args, warmup=2, iters=20, iters_lo=None):
    """Two-point measurement: slope between a short and a long run removes
    the fixed sync round-trip (~25ms through the tunnel)."""
    import numpy as _np

    iters_lo = max(2, iters // 5) if iters_lo is None else iters_lo
    wrapped = _reduced(fn)
    for _ in range(warmup):
        s = wrapped(*args)
    float(_np.asarray(s))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            s = wrapped(*args)
        float(_np.asarray(s))
        return time.perf_counter() - t0

    t_lo = run(iters_lo)
    t_hi = run(iters)
    per = (t_hi - t_lo) / max(1, iters - iters_lo)
    # guard against noise producing non-positive slopes
    return max(per, t_hi / iters * 0.05, 1e-7)


_E2E_CHILD = """
import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.pipeline.system import GMMLocSystem

out = open(sys.argv[1], "w", buffering=1)
N_FRAMES = int(sys.argv[2])
MODE = sys.argv[3] if len(sys.argv) > 3 else "offline"
START = 150
cfg = euroc_v1_config()
# both modes use the device-chained deep pipeline — the SAME tracking
# configuration the committed ATE artifacts run (expr_r4 production
# config); offline keeps mapping synchronous inline (DSO protocol,
# gmmloc.cpp:172-174), online moves it to the mapping thread
tk = dict(velocity_damping=0.9, pipeline_depth=4)
if MODE == "online":
    # production operating point: online threaded mapping
    # (ref gmmloc.cpp:56-59 two-thread split)
    cfg = cfg.replace(online=True)
cfg = cfg.replace(tracking=dataclasses.replace(cfg.tracking, **tk))
gmap = mixture.load(
    synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
    neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
    neighbor_cap=cfg.gmm.neighbor_cap)
fe, ts, q_wc, t_wc = synthetic.make_sequence(
    cfg, gt_path=f"{synthetic.GT_DIR}/V1_01_easy.txt",
    gmm_path=synthetic.V1_GMM, n_landmarks=30000, seed=0,
    disp_noise=0.1, pixel_noise=0.25, drop_frac=0.1)
sys_ = GMMLocSystem(cfg, gmap)
# pre-compile every shape tier a long run can hit (BA window tiers,
# fusion buckets) so no jit compile lands inside the measured window
from gmmloc_tpu.pipeline import prewarm as prewarm_mod
prewarm_mod.prewarm(cfg, sys_.cam)
# harness OFF the clock (VERDICT r2 weak #1): pre-generate every frame
# before the measured loop — the synthetic frontend is test scaffolding,
# not part of the system under measurement
frames = []
for i in range(N_FRAMES):
    fi = START + i
    frames.append((fe.make_frame(i, ts[fi], q_wc[fi], t_wc[fi]),
                   q_wc[fi], t_wc[fi]))
# warmup: first frames pay the remaining first-touch compiles
WARM = 25
for i, (f, gq, gt) in enumerate(frames):
    st = sys_.step(f, gq, gt)
    if sys_.track_failed:
        break
    out.write("%d %.6f %d\\n" % (i, time.perf_counter(),
                                 int(st.res) if st is not None else 1))
st = sys_.flush()
sys_.stop()
out.write("done\\n")
"""


_IMG_CHILD = """
import sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "highest")
from gmmloc_tpu.config import euroc_v1_config
from gmmloc_tpu.eval import synthetic
from gmmloc_tpu.eval.image_synthetic import SpriteRenderer
from gmmloc_tpu.gmm import mixture
from gmmloc_tpu.pipeline.frontend import ImageFrontend
from gmmloc_tpu.pipeline.system import GMMLocSystem
from gmmloc_tpu.utils import proto

out = open(sys.argv[1], "w", buffering=1)
N = int(sys.argv[2])
START = 150
cfg = euroc_v1_config()
cfg = cfg.replace(
    camera=dataclasses.replace(cfg.camera, do_rectify=False,
                               do_equalization=False),
    tracking=dataclasses.replace(cfg.tracking, velocity_damping=0.9,
                                 pipeline_depth=4),
    online=True,
)
ts, q_wc, t_wc = synthetic.load_gt_trajectory(
    f"{synthetic.GT_DIR}/V1_01_easy.txt")
means, covs, _, _ = proto.load_gmm_file(synthetic.V1_GMM)
world = synthetic.sample_world_from_gmm(means, covs, n_landmarks=9000)
renderer = SpriteRenderer(world, cfg)
frontend = ImageFrontend(cfg)
gmap = mixture.load(synthetic.V1_GMM, pad_to=cfg.caps.gmm_components_pad,
                    neighbor_dist_thresh=cfg.gmm.neighbor_dist_thresh,
                    neighbor_cap=cfg.gmm.neighbor_cap)
sys_ = GMMLocSystem(cfg, gmap)
# sprite rendering is harness, not system: render OFF the clock
imgs = []
for i in range(N):
    fi = START + i
    l, r = renderer.render_stereo(q_wc[fi], t_wc[fi])
    imgs.append((np.clip(np.round(l), 0, 255).astype(np.uint8),
                 np.clip(np.round(r), 0, 255).astype(np.uint8)))
pend = None
i_prev = -1
for i in range(N + 1):
    pend_new = None
    if i < N:
        fi = START + i
        pend_new = frontend.dispatch(i, ts[fi], *imgs[i])
    if pend is not None:
        frame = frontend.complete(pend)
        fi = START + i_prev
        st = sys_.step(frame, q_wc[fi], t_wc[fi])
        if sys_.track_failed:
            break
        out.write("%d %.6f 1\\n" % (i_prev, time.perf_counter()))
    pend, i_prev = pend_new, i
sys_.flush()
sys_.stop()
out.write("done\\n")
"""


def img_e2e_fps(n_frames: int = 250, warm: int = 40,
                timeout_s: float = 1200.0):
    """Image-path fps: sprite stereo -> fused packed front-end
    (rectify/detect/stereo in one program, double-buffered) -> tracking,
    production online+chained config (VERDICT r3 missing #1: the
    reference's fps includes ORB extraction + stereo matching,
    gmmloc.cpp:199-267)."""
    path = tempfile.mktemp(suffix=".imglog")
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", _IMG_CHILD, path, str(n_frames)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=fast_tpu_child_env(),
    )
    last_n, last_progress = -1, time.time()
    while proc.poll() is None:
        time.sleep(2.0)
        try:
            with open(path) as f:
                n = sum(1 for _ in f)
        except OSError:
            n = 0
        if n > last_n:
            last_n, last_progress = n, time.time()
        stalled = last_n > 0 and time.time() - last_progress > 180.0
        if time.time() - t0 > timeout_s or stalled:
            proc.kill()
            break
    proc.wait()
    rows = []
    try:
        with open(path) as f:
            for line in f:
                parts = line.split()
                if parts[0] != "done":
                    rows.append((int(parts[0]), float(parts[1])))
        os.unlink(path)
    except OSError:
        pass
    if len(rows) < warm + 20:
        return None, len(rows)
    (i0, t_a), (i1, t_b) = rows[warm], rows[-1]
    return (i1 - i0) / max(t_b - t_a, 1e-9), len(rows)


def e2e_fps(n_frames: int = 175, warm: int = 25, timeout_s: float = 1400.0,
            mode: str = "offline"):
    """Tracked frames/sec through GMMLocSystem.step (child process with
    per-frame progress; partial results survive a tunnel wedge)."""
    path = tempfile.mktemp(suffix=".e2elog")
    t0 = time.time()
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", _E2E_CHILD, path, str(n_frames), mode],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        env=fast_tpu_child_env(),
    )
    last_n = -1
    last_progress = time.time()
    while proc.poll() is None:
        time.sleep(2.0)
        try:
            with open(path) as f:
                n = sum(1 for _ in f)
        except OSError:
            n = 0
        if n > last_n:
            last_n, last_progress = n, time.time()
        # no new frame for 180s after the first ones -> wedged; overall cap
        stalled = last_n > 0 and time.time() - last_progress > 180.0
        if time.time() - t0 > timeout_s or stalled:
            proc.kill()
            break
    proc.wait()
    rows = []
    try:
        with open(path) as f:
            for line in f:
                parts = line.split()
                if parts[0] != "done":
                    rows.append((int(parts[0]), float(parts[1])))
        os.unlink(path)
    except OSError:
        pass
    if len(rows) < warm + 20:
        return None, len(rows), {}
    # fps over the post-warmup window
    (i0, t_a), (i1, t_b) = rows[warm], rows[-1]
    # robust per-frame latency: the dev tunnel's dispatch jitter puts
    # multi-second spikes in the tail (see expr_prof/step_profile_r3_*),
    # so report p50/p95 frame time alongside the mean-derived headline
    dts = sorted(
        rows[k + 1][1] - rows[k][1] for k in range(warm, len(rows) - 1)
    )
    pct = {}
    if dts:
        # nearest-rank at round((n-1)*q): consistent estimator for small n
        # (ADVICE r3: len//2 took the upper median; int(n*.95) over-indexed)
        p50 = dts[round((len(dts) - 1) * 0.50)]
        p95 = dts[round((len(dts) - 1) * 0.95)]
        pct = {
            "e2e_frame_ms_p50": round(p50 * 1e3, 2),
            "e2e_frame_ms_p95": round(p95 * 1e3, 2),
            "e2e_fps_p50": round(1.0 / max(p50, 1e-9), 2),
        }
    return (i1 - i0) / max(t_b - t_a, 1e-9), len(rows), pct


def main():
    # ---- headline FIRST: end-to-end fps through system.step ------------
    # (same code path as the ATE artifacts; VERDICT r1 missing #2).
    # Must run BEFORE this process initializes the TPU client — two
    # processes cannot share the single chip.
    # Headline: the production online+chained operating point (600
    # frames so several KF cycles land inside the measured window).
    fps_e2e, n_done, e2e_pct = e2e_fps(
        n_frames=600, warm=60, mode="online", timeout_s=1000.0
    )
    # Detail: the offline single-thread protocol configuration (the
    # accuracy/ATE config; comparable with the BENCH_r02/r03 series).
    fps_off, n_off, off_pct = e2e_fps(
        n_frames=175, warm=25, mode="offline", timeout_s=700.0
    )
    # Image-path line: fps through the FULL front-end (pyramid/FAST/
    # BRIEF/stereo) + tracking on sprite frames (VERDICT r3 missing #1).
    fps_img, n_img = img_e2e_fps(n_frames=250, warm=40, timeout_s=700.0)

    import jax
    import jax.numpy as jnp

    # measure the accurate operating point: f32 contractions at full
    # precision (the production default, SystemConfig.matmul_precision)
    jax.config.update("jax_default_matmul_precision", "highest")

    from gmmloc_tpu.config import euroc_v1_config
    from gmmloc_tpu.features import matching
    from gmmloc_tpu.geometry import camera as cam_mod
    from gmmloc_tpu.gmm import mixture, render
    from gmmloc_tpu.solver import local_ba, pose_solver

    cfg = euroc_v1_config()
    cam = cam_mod.CameraParams.from_config(cfg.camera)
    rng = np.random.default_rng(0)
    F = cfg.frame.feat_cap  # 1280

    detail = {}

    # ---- per-frame tracking work ---------------------------------------
    uv = rng.uniform([40, 40], [cam.width - 40, cam.height - 40], (F, 2))
    z = rng.uniform(1.0, 12.0, F)
    x_w = np.stack(
        [(uv[:, 0] - cam.cx) / cam.fx * z, (uv[:, 1] - cam.cy) / cam.fy * z, z], -1
    )
    obs = np.concatenate([uv, (uv[:, 0] - cam.bf / z)[:, None]], -1).astype(np.float32)
    desc = rng.integers(0, 256, (F, 32), dtype=np.uint8)
    octv = rng.integers(0, 8, F).astype(np.int32)
    args_match = (
        jnp.array(uv, jnp.float32), jnp.array(obs[:, 2]), jnp.array(desc),
        jnp.array(octv), jnp.zeros(F, jnp.float32), jnp.ones(F, bool),
        jnp.full(F, 15.0, jnp.float32), jnp.array(octv - 1), jnp.array(octv + 1),
        jnp.array(uv, jnp.float32), jnp.array(obs[:, 2]), jnp.array(desc),
        jnp.array(octv), jnp.zeros(F, jnp.float32), jnp.ones(F, bool),
        jnp.zeros(F, bool),
    )
    t_match = timeit(matching.search_by_projection, *args_match)

    q0 = jnp.array([1.0, 0.001, -0.002, 0.0005])
    q0 = q0 / jnp.linalg.norm(q0)
    args_pose = (
        q0, jnp.array([0.01, -0.02, 0.005]),
        jnp.array(x_w, jnp.float32), jnp.array(obs), jnp.ones(F, bool),
        jnp.ones(F, jnp.float32), jnp.ones(F, bool),
    )
    t_pose = timeit(lambda *a: pose_solver.optimize_pose(cam, *a), *args_pose)
    detail["match_ms"] = t_match * 1e3
    detail["pose_opt_ms"] = t_pose * 1e3

    # fused single-dispatch track step (the production per-frame path)
    import sys as _sys

    _sys.path.insert(0, "/root/repo")
    import __graft_entry__ as _graft

    fused_fn, fused_args = _graft.entry()
    t_frame = timeit(fused_fn, *fused_args)
    detail["fused_track_step_ms"] = t_frame * 1e3

    # ---- per-keyframe GMM association ----------------------------------
    gmap = mixture.load(
        "/root/reference/gmmloc_ros/data/map/v1.gmm", pad_to=3328
    )
    qr = jnp.array([1.0, 0, 0, 0], jnp.float32)
    tr = jnp.zeros(3, jnp.float32)
    t_render = timeit(lambda q, t: render.render_view(gmap, cam, q, t), qr, tr, iters=10)
    r2d = render.render_view(gmap, cam, qr, tr)
    feat_uv = jnp.array(uv, jnp.float32)
    t_assoc = timeit(
        lambda r, u: render.search_correspondence(r, u, jnp.ones(F, bool)),
        r2d, feat_uv, iters=10,
    )
    detail["render_view_ms"] = t_render * 1e3
    detail["search_corr_ms"] = t_assoc * 1e3

    # ---- per-keyframe local BA (production window shape) ---------------
    L, C, P, MO = 16, 48, 8192, cfg.caps.ba_obs_per_point
    cam_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (C, 1))
    cam_t = np.zeros((C, 3), np.float32)
    cam_t[:, 0] = np.arange(C) * 0.05
    pts = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(3, 9, P)], -1
    ).astype(np.float32)
    obs_cam = rng.integers(0, C, (P, MO)).astype(np.int32)
    pc = pts[:, None, :] + cam_t[obs_cam]
    uvr = np.stack(
        [
            cam.fx * pc[..., 0] / pc[..., 2] + cam.cx,
            cam.fy * pc[..., 1] / pc[..., 2] + cam.cy,
            cam.fx * pc[..., 0] / pc[..., 2] + cam.cx - cam.bf / pc[..., 2],
        ],
        -1,
    ).astype(np.float32)
    # realistic observation noise + perturbed init: a noise-free problem
    # converges in 1-2 LM iterations and under-reports the solve cost
    uvr += rng.normal(0, 0.5, uvr.shape).astype(np.float32)
    pts_init = (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)
    prob = local_ba.BAProblem(
        cam_q=jnp.array(cam_q), cam_t=jnp.array(cam_t),
        cam_valid=jnp.ones(C, bool),
        pts=jnp.array(pts_init), pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.array(obs_cam),
        obs_uvr=jnp.array(uvr), obs_stereo=jnp.ones((P, MO), bool),
        obs_sigma2_inv=jnp.ones((P, MO), jnp.float32),
        obs_valid=jnp.ones((P, MO), bool),
        str_type=jnp.full(P, local_ba.STR_DEG, jnp.int32),
        str_normal=jnp.tile(jnp.array([0.0, 0, 1], jnp.float32), (P, 1)),
        str_mean=jnp.array(pts),
        str_sqrt_info=jnp.tile(jnp.eye(3, dtype=jnp.float32), (P, 1, 1)),
        prior_q=jnp.array(cam_q[0]), prior_t=jnp.array(cam_t[0]),
        has_prior=jnp.array(True),
    )
    t_ba = timeit(
        lambda p: local_ba.solve_local_ba(
            cam, p, n_free=L, schur_impl=cfg.loc.ba_schur_impl
        ),
        prob, warmup=1, iters=3,
    )
    detail["local_ba_ms"] = t_ba * 1e3
    detail["ba_solves_per_sec"] = 1.0 / t_ba
    detail["ba_schur_impl"] = cfg.loc.ba_schur_impl

    # offline protocol: KF (assoc + BA) inline every ~8 frames (measured
    # KF cadence across the r2 protocol sweep: 46-87 KFs per 400 frames)
    kf_every = 8.0
    t_total = t_frame + (t_render + t_assoc + t_ba) / kf_every
    detail["frame_core_ms"] = t_frame * 1e3
    detail["kernel_composite_fps"] = 1.0 / t_total
    detail["device"] = str(jax.devices()[0])

    detail["e2e_frames_completed"] = n_done
    detail.update(e2e_pct)
    detail["e2e_config"] = "online threaded mapping + pipeline_depth=4"
    detail["image_path_fps"] = None if fps_img is None else round(fps_img, 2)
    detail["image_path_frames"] = n_img
    if fps_off is not None:
        detail["e2e_offline_fps"] = round(fps_off, 2)
        detail["e2e_offline_frames"] = n_off
        for k, v in off_pct.items():
            detail["offline_" + k] = v
    if fps_e2e is None:
        # tunnel wedged before a measurable window: fall back to the
        # offline run, then the kernel composite — and SAY so
        if fps_off is not None:
            detail["e2e_status"] = "online child incomplete; value is offline e2e"
            fps = fps_off
        else:
            detail["e2e_status"] = "incomplete; value is kernel composite"
            fps = 1.0 / t_total
    else:
        detail["e2e_status"] = "ok"
        fps = fps_e2e

    print(json.dumps(detail), file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_chip",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 20.0, 2),
            }
        )
    )


def _watchdog(seconds: float = 2800.0):
    """The development TPU tunnel intermittently wedges transfers; never
    let the bench hang the round — emit a sentinel line and exit."""
    import os
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "tracked_frames_per_sec_chip",
                    "value": 0.0,
                    "unit": "fps",
                    "vs_baseline": 0.0,
                    "error": "watchdog: TPU tunnel wedged during bench",
                }
            ),
            flush=True,
        )
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    t = _watchdog()
    main()
    t.cancel()
