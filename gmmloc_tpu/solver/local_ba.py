"""Local bundle adjustment with GMM structure factors — Schur-complement LM.

TPU-native replacement for Localization::jointOptimization
(ref: /root/reference/gmmloc/src/modules/localization_opt.cpp:456-925).
The g2o sparse graph (SE3 vertices + marginalized point vertices + mono/
stereo reprojection edges + EdgePt2Gaussian{,Deg} structure edges + the
first-KF SE3 prior) becomes fixed-capacity arrays and one jitted staged
LM schedule:

  stage 1 (5 it) -> deactivate bad degenerate-GMM edges
                    (chi2 > tri_str_thresh * ba_lambda2, :773-789)
  stage 2 (5 it) -> deactivate bad reprojection edges (chi2 gates /
                    negative depth), drop Huber (:797-825)
  stage 3 (40 it)

Data layout: observations live in a PER-POINT table (P, MO) — gathers +
dense einsum reductions only. TPU scatters serialize (the earlier COO
formulation spent ~15 ms/iteration in scatter-adds); with per-point
tables every reduction is a gather + one-hot einsum on the MXU. Landmark
blocks are eliminated per point (dense 3x3), the reduced (6L x 6L)
camera system is assembled with einsums and solved directly.

LM loop structure: the residual/Jacobian products at the CURRENT
accepted state are carried in the loop state, so each LM iteration runs
exactly ONE (P, MO) residual+Jacobian pass — at the PROPOSED state,
where its chi2 doubles as the accept-test cost. A rejected step redoes
only the (cheap) damped assembly+solve from the carried products with a
larger lambda; the earlier formulation paid a full residual pass for the
cost AND recomputed Jacobians at the unchanged state after a reject.
Products are mask-independent (active/huber masks apply at assembly
time), so they stay valid across the stage-gate transitions.

Variant selection: flat/lu 75.5 ms, flat/cg 78.0 ms, onehot/lu 107.9 ms
per staged solve (HISTORICAL: measured round 1 on TPU v5e at tier
L=16/P=8192/MO=12, 0.5 px noise, tools/ba_variants.py, BEFORE the
carried-products LM loop halved the (P,MO) passes) — hence the "flat"
Schur default. LU keeps the exact step; the 96x96 solve is ~0.6 ms.
Current absolute cost of the production solve in situ: loc/ba mean
140-170 ms per spin incl. gather/write-back through the dev tunnel
(expr_prof/step_profile_r3_tpu_devworld4.json); re-run
tools/ba_variants.py on direct-attached hardware before revisiting the
variant ranking.

Memory note: carrying r/Jc/Jp ((P,MO,3,6)+(P,MO,3,3)+(P,MO,3) in bf16)
in the while_loop keeps two copies live (accepted + proposed) during the
accept select — a few MB extra peak HBM at current tiers, traded for
skipping a full recompute pass on reject. Revisit with input/output
aliasing if P/MO tiers grow ~10x.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import camera as cam_mod
from ..geometry import se3
from . import factors

CHI2_MONO = 5.991
CHI2_STEREO = 7.815

# GMM association types (mirrors MapPoint provenance semantics)
STR_NONE = 0
STR_DEG = 1      # degenerate component -> 1D point-to-plane edge
STR_NONDEG = 2   # full component -> 3D sqrt-info whitened edge


class BAProblem(NamedTuple):
    """Fixed-capacity local-BA problem. C camera slots (first n_free are
    optimizable), P point slots, MO observation slots per point."""

    cam_q: jax.Array          # (C,4) T_cw rotations
    cam_t: jax.Array          # (C,3)
    cam_valid: jax.Array      # (C,) bool
    pts: jax.Array            # (P,3) world points
    pt_valid: jax.Array       # (P,) bool
    obs_cam: jax.Array        # (P,MO) int32, -1 = empty slot
    obs_uvr: jax.Array        # (P,MO,3)
    obs_stereo: jax.Array     # (P,MO) bool
    obs_sigma2_inv: jax.Array  # (P,MO)
    obs_valid: jax.Array      # (P,MO) bool
    str_type: jax.Array       # (P,) int32 STR_*
    str_normal: jax.Array     # (P,3) dominant normal (deg)
    str_mean: jax.Array       # (P,3) component mean
    str_sqrt_info: jax.Array  # (P,3,3) lower chol of cov_inv (nondeg)
    prior_q: jax.Array        # (4,) prior for camera slot 0
    prior_t: jax.Array        # (3,)
    has_prior: jax.Array      # () bool


class BAResult(NamedTuple):
    cam_q: jax.Array
    cam_t: jax.Array
    pts: jax.Array
    obs_bad: jax.Array        # (P,MO) bool — erase these observations
    str_drop: jax.Array       # (P,) bool — downgrade GMM association
    obs_chi2: jax.Array       # (P,MO)
    cost: jax.Array           # () final total cost
    n_iters: jax.Array        # () int32 LM iterations used across stages


def _inv3(m):
    """Closed-form 3x3 inverse (adjugate) — batched LAPACK inv/det lower to
    serialized loops on TPU and dominated the BA iteration time."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    det = a * A + d * B + g * C
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], -1),
            jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
            jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
        ],
        axis=-2,
    )
    det_safe = jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    inv = adj / det_safe[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=m.dtype), m.shape)
    inv = jnp.where(jnp.abs(det)[..., None, None] < 1e-20, eye, inv)
    return inv, det


def _obs_residuals(cam, prob: BAProblem, cam_q, cam_t, pts):
    """Residual-only pass (no Jacobians) for cost evaluation."""
    ci = jnp.clip(prob.obs_cam, 0)
    q = cam_q[ci]
    t = cam_t[ci]
    x = pts[:, None, :]
    r, pc, depth_ok = factors.reproj_residual(
        cam, q, t, jnp.broadcast_to(x, prob.obs_uvr.shape), prob.obs_uvr,
        prob.obs_stereo,
    )
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_sigma2_inv
    return chi2, depth_ok


def _obs_terms(cam, prob: BAProblem, cam_q, cam_t, pts):
    """Residual/Jacobian pass over the (P, MO) observation table."""
    ci = jnp.clip(prob.obs_cam, 0)
    q = cam_q[ci]                        # (P,MO,4)
    t = cam_t[ci]
    x = pts[:, None, :]                  # (P,1,3) broadcast over MO
    r, pc, depth_ok = factors.reproj_residual(
        cam, q, t, jnp.broadcast_to(x, prob.obs_uvr.shape), prob.obs_uvr,
        prob.obs_stereo,
    )
    Jc = factors.stereo_proj_jac_pose(cam, pc, prob.obs_stereo)    # (P,MO,3,6)
    Jp = factors.stereo_proj_jac_point(cam, q, pc, prob.obs_stereo)  # (P,MO,3,3)
    chi2 = jnp.sum(r * r, axis=-1) * prob.obs_sigma2_inv
    return r, Jc, Jp, chi2, depth_ok


def _gmm_terms(prob: BAProblem, pts, ba_lambda2, active_str):
    """Structure-factor contributions to the point blocks (see reference
    edge defs, localization_opt.cpp:650-683)."""
    is_deg = (prob.str_type == STR_DEG) & active_str
    is_nd = (prob.str_type == STR_NONDEG) & active_str

    rs = factors.pt2plane_residual(pts, prob.str_mean, prob.str_normal)  # (P,)
    n = prob.str_normal
    H_deg = ba_lambda2 * n[:, :, None] * n[:, None, :]
    b_deg = (ba_lambda2 * rs)[:, None] * n

    L = prob.str_sqrt_info
    d = pts - prob.str_mean
    r_nd = jnp.einsum("pji,pj->pi", L, d)
    H_nd = jnp.einsum("pij,pkj->pik", L, L)
    b_nd = jnp.einsum("pij,pj->pi", L, r_nd)

    H = jnp.where(is_deg[:, None, None], H_deg, 0.0) + jnp.where(
        is_nd[:, None, None], H_nd, 0.0
    )
    b = jnp.where(is_deg[:, None], b_deg, 0.0) + jnp.where(is_nd[:, None], b_nd, 0.0)
    cost = jnp.where(is_deg, ba_lambda2 * rs * rs, 0.0) + jnp.where(
        is_nd, jnp.sum(r_nd * r_nd, axis=-1), 0.0
    )
    return H, b, cost


def _prior_terms(prob: BAProblem, cam_q, cam_t, rot_info, trans_info):
    """First-KF SE3 prior (localization_opt.cpp:558-582)."""
    r = factors.se3_prior_residual(cam_q[0], cam_t[0], prob.prior_q, prob.prior_t)
    J = factors.se3_prior_jacobian(cam_q[0], cam_t[0], prob.prior_q, prob.prior_t)
    info = jnp.concatenate(
        [jnp.full(3, rot_info, r.dtype), jnp.full(3, trans_info, r.dtype)]
    )
    w = prob.has_prior.astype(r.dtype)
    H = w * jnp.einsum("ij,i,ik->jk", J, info, J)
    b = w * jnp.einsum("ij,i,i->j", J, info, r)
    cost = w * jnp.sum(info * r * r)
    return H, b, cost


def _pcg_solve(S, b, iters: int):
    """Jacobi-preconditioned CG for the reduced camera system. LM accepts
    inexact steps (the accept test uses the exact cost), and a fixed-count
    CG of matvecs maps to the TPU far better than the sequential LU that
    jnp.linalg.solve lowers to."""
    d = jnp.diagonal(S)
    Minv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
    x = jnp.zeros_like(b)
    r = b
    z = Minv * r
    p = z
    rz = jnp.dot(r, z)

    def body(_, carry):
        x, r, p, rz = carry
        Sp = S @ p
        denom = jnp.dot(p, Sp)
        alpha = jnp.where(jnp.abs(denom) < 1e-30, 0.0, rz / denom)
        x = x + alpha * p
        r = r - alpha * Sp
        z = Minv * r
        rz_new = jnp.dot(r, z)
        beta = jnp.where(jnp.abs(rz) < 1e-30, 0.0, rz_new / rz)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "n_free", "ba_lambda2", "tri_str_thresh",
        "prior_rot_info", "prior_trans_info",
        "iters1", "iters2", "iters3", "term_gain", "use_bf16",
        "schur_impl", "linear_solver", "cg_iters",
    ),
)
def solve_local_ba(
    cam: cam_mod.CameraParams,
    prob: BAProblem,
    n_free: int,
    ba_lambda2: float = 400.0,
    tri_str_thresh: float = 0.0064,
    prior_rot_info: float = 1.0 / (2.0 * jnp.pi / 180.0) ** 2,
    prior_trans_info: float = 1.0 / 0.01**2,
    iters1: int = 5,
    iters2: int = 5,
    iters3: int = 40,
    term_gain: float = 1e-5,
    use_bf16: bool = True,
    schur_impl: str = "flat",
    linear_solver: str = "lu",
    cg_iters: int = 48,
) -> BAResult:
    L = n_free
    P, MO = prob.obs_cam.shape
    dtype = prob.pts.dtype
    huber_delta = jnp.where(
        prob.obs_stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO)
    ).astype(dtype)
    chi2_th = jnp.where(prob.obs_stereo, CHI2_STEREO, CHI2_MONO).astype(dtype)

    free_mask = (jnp.arange(prob.cam_q.shape[0]) < L) & prob.cam_valid
    obs_exists = (prob.obs_cam >= 0) & prob.pt_valid[:, None]
    obs_on_free = obs_exists & (prob.obs_cam < L) & free_mask[
        jnp.clip(prob.obs_cam, 0, L - 1)
    ]
    # one-hot over free camera slots: (P, MO, L) — gathered reductions only
    onehot = (
        (prob.obs_cam[..., None] == jnp.arange(L)[None, None, :])
        & obs_on_free[..., None]
    ).astype(dtype)

    # bf16 staging for the heavy (P,MO,·) einsums — inputs in bfloat16,
    # accumulation in f32 on the MXU. The Hessian blocks become mildly
    # approximate (a preconditioner-quality change; the LM accept test
    # uses the exact f32 cost), halving the dominant HBM traffic. chi2 is
    # always computed in f32 inside the pass, so the accept cost is exact.
    stage_dt = jnp.bfloat16 if use_bf16 else dtype
    ohb = onehot.astype(stage_dt)

    def products_at(cam_q, cam_t, pts):
        """The single (P, MO) residual+Jacobian pass. Everything heavy the
        LM loop needs at a state is computed here once."""
        r, Jc, Jp, chi2, depth_ok = _obs_terms(cam, prob, cam_q, cam_t, pts)
        return (
            r.astype(stage_dt), Jc.astype(stage_dt), Jp.astype(stage_dt),
            chi2, depth_ok,
        )

    def cost_from(products, cam_q, cam_t, pts, active_obs, active_str, use_huber):
        """Exact total cost from carried products — no (P,MO,·) pass."""
        s = products[3]
        d = huber_delta
        rho = jnp.where(
            use_huber & (s > d * d), 2.0 * d * jnp.sqrt(jnp.clip(s, 1e-24)) - d * d, s
        )
        c_obs = jnp.sum(jnp.where(active_obs, rho, 0.0))
        _, _, c_str = _gmm_terms(prob, pts, ba_lambda2, active_str)
        _, _, c_pri = _prior_terms(
            prob, cam_q, cam_t, prior_rot_info, prior_trans_info
        )
        return c_obs + jnp.sum(jnp.where(prob.pt_valid, c_str, 0.0)) + c_pri

    def lm_step(products, cam_q, cam_t, pts, lam, active_obs, active_str, use_huber):
        rb, Jcb, Jpb, chi2, _ = products
        hw = jnp.where(use_huber, factors.huber_weight(chi2, huber_delta), 1.0)
        w = prob.obs_sigma2_inv * hw * active_obs.astype(dtype)   # (P,MO)
        wb = w.astype(stage_dt)
        ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)

        # point blocks (dense per-point reductions over MO)
        H_pp = ein("pmai,pm,pmaj->pij", Jpb, wb, Jpb)
        b_p = ein("pmai,pm,pma->pi", Jpb, wb, rb)
        H_str, b_str, _ = _gmm_terms(prob, pts, ba_lambda2, active_str)
        H_pp = H_pp + jnp.where(prob.pt_valid[:, None, None], H_str, 0.0)
        b_p = b_p + jnp.where(prob.pt_valid[:, None], b_str, 0.0)

        H_pri, b_pri, _ = _prior_terms(
            prob, cam_q, cam_t, prior_rot_info, prior_trans_info
        )

        # LM damping on points (multiplicative block-diagonal)
        eyep = jnp.eye(3, dtype=dtype)
        H_pp_d = H_pp + lam * (
            jnp.einsum("pii->p", H_pp)[:, None, None] / 3.0 + 1e-9
        ) * eyep
        H_pp_d = jnp.where(
            prob.pt_valid[:, None, None], H_pp_d, jnp.eye(3, dtype=dtype)
        )
        Hpp_inv, _ = _inv3(H_pp_d)
        eyec = jnp.eye(6, dtype=dtype)

        if schur_impl == "flat":
            # Flattened-GEMM assembly: the camera-side reductions become
            # large clean matmuls — Z[p, n, l*6+i] = onehot[p,m,l] *
            # Jc[p,m,a,i] with n = m*3+a, so H_cc = Z^T W Z ((96, P·N) @
            # (P·N, 96)), U = batched (P,96,N)@(P,N,3), and the Schur term
            # is one (96, P·3)@(P·3, 96) GEMM. Bit-equal to the one-hot
            # einsum path (same contractions, reshaped for MXU tiling).
            N = MO * 3
            Z = (ohb[:, :, None, :, None] * Jcb[:, :, :, None, :]).reshape(
                P, N, L * 6
            )
            Wn = jnp.repeat(wb, 3, axis=-1).reshape(P, N)
            Jpf = Jpb.reshape(P, N, 3)
            rf = rb.reshape(P, N)
            ZW = Z * Wn[..., None]
            H_cc_full = ein("pnc,pnd->cd", ZW, Z)            # (6L,6L)
            b_c_full = ein("pnc,pn->c", ZW, rf)              # (6L,)
            Uf = ein("pnc,pnj->pcj", ZW, Jpf)                # (P,6L,3)

            H_cc_full = H_cc_full.at[:6, :6].add(H_pri)
            b_c_full = b_c_full.at[:6].add(b_pri)

            Tf = ein("pcj,pjk->pck", Uf, Hpp_inv.astype(jnp.float32))
            S_flat = H_cc_full - ein("pcj,pdj->cd", Tf, Uf)
            # camera LM damping: per-6x6-block trace/6 on the diagonal
            tr = jnp.einsum("cc->c", H_cc_full).reshape(L, 6).sum(-1)
            S_flat = S_flat + jnp.diag(
                jnp.repeat(lam * (tr / 6.0 + 1e-9), 6)
            )
            b_red = (b_c_full - ein("pcj,pj->c", Tf, b_p)).reshape(L, 6)
        else:
            # camera blocks via one-hot einsum (no scatters)
            H_cc = ein("pmai,pm,pmaj,pml->lij", Jcb, wb, Jcb, ohb)
            b_c = ein("pmai,pm,pma,pml->li", Jcb, wb, rb, ohb)
            H_cc = H_cc.at[0].add(H_pri)
            b_c = b_c.at[0].add(b_pri)

            # camera-point coupling U[p,l] = sum_m Jc^T W Jp
            U = ein("pmai,pm,pmaj,pml->plij", Jcb, wb, Jpb, ohb)  # (P,L,6,3)

            H_cc_d = H_cc + lam * (
                jnp.einsum("lii->l", H_cc)[:, None, None] / 6.0 + 1e-9
            ) * eyec

            # Schur reduction (MXU einsums over P)
            T = jnp.einsum("plij,pjk->plik", U, Hpp_inv)          # (P,L,6,3)
            S_red = -jnp.einsum("plij,pmkj->lmik", T, U)
            S_red = S_red.at[jnp.arange(L), jnp.arange(L)].add(H_cc_d)
            b_red = b_c - jnp.einsum("plij,pj->li", T, b_p)       # (L,6)
            S_flat = S_red.transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
            Uf = U.reshape(P, L * 6, 3)

        fm = free_mask[:L]
        diag_fix = jnp.repeat(~fm, 6)
        S_flat = jnp.where(
            diag_fix[:, None] | diag_fix[None, :],
            jnp.eye(L * 6, dtype=dtype),
            S_flat,
        )
        b_flat = jnp.where(jnp.repeat(fm, 6), b_red.reshape(-1), 0.0)

        if linear_solver == "cg":
            dc = -_pcg_solve(S_flat, b_flat, cg_iters).reshape(L, 6)
        else:
            dc = -jnp.linalg.solve(S_flat, b_flat).reshape(L, 6)
        dc = jnp.where(fm[:, None], dc, 0.0)

        # back-substitute points (gathers only)
        rhs_p = b_p + jnp.einsum("pcj,c->pj", Uf, dc.reshape(-1))
        dp = -jnp.einsum("pij,pj->pi", Hpp_inv, rhs_p)
        dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)

        new_q_free, new_t_free = se3.boxplus(cam_q[:L], cam_t[:L], dc)
        new_q = jnp.concatenate([new_q_free, cam_q[L:]], axis=0)
        new_t = jnp.concatenate([new_t_free, cam_t[L:]], axis=0)
        return new_q, new_t, pts + dp

    def run_stage(state, active_obs, active_str, use_huber, iters):
        # while_loop with convergence termination — g2o's optimize(n) also
        # stops early when the chi2 gain becomes negligible, and most of
        # the 40-iteration budget is never used.
        def cond(carry):
            _, _, _, _, lam, cost, it, done = carry
            return (it < iters) & ~done

        def body(carry):
            cam_q, cam_t, pts, products, lam, cost, it, done = carry
            nq, nt, npts = lm_step(
                products, cam_q, cam_t, pts, lam, active_obs, active_str, use_huber
            )
            nproducts = products_at(nq, nt, npts)
            new_cost = cost_from(
                nproducts, nq, nt, npts, active_obs, active_str, use_huber
            )
            accept = new_cost < cost
            gain = (cost - new_cost) / jnp.maximum(cost, 1e-12)
            done = (accept & (gain < term_gain)) | (lam > 1e4)
            cam_q = jnp.where(accept, nq, cam_q)
            cam_t = jnp.where(accept, nt, cam_t)
            pts = jnp.where(accept, npts, pts)
            products = jax.tree_util.tree_map(
                lambda new, old: jnp.where(accept, new, old), nproducts, products
            )
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), lam * 4.0)
            cost = jnp.minimum(new_cost, cost)
            return cam_q, cam_t, pts, products, lam, cost, it + 1, done

        cam_q, cam_t, pts, products, lam0, it_tot = state
        cost0 = cost_from(
            products, cam_q, cam_t, pts, active_obs, active_str, use_huber
        )
        out = jax.lax.while_loop(
            cond, body,
            (cam_q, cam_t, pts, products, lam0, cost0, jnp.array(0),
             jnp.array(False)),
        )
        return out[:5] + (it_tot + out[6],)

    use_huber = jnp.array(True)
    active_obs = prob.obs_valid & obs_exists
    active_str = prob.pt_valid & (prob.str_type != STR_NONE)

    state = (
        prob.cam_q, prob.cam_t, prob.pts,
        products_at(prob.cam_q, prob.cam_t, prob.pts),
        jnp.array(1e-4, dtype), jnp.array(0),
    )
    state = run_stage(state, active_obs, active_str, use_huber, iters1)

    # stage-1 -> stage-2 gate: drop bad degenerate structure edges (:773-789)
    pts_s1 = state[2]
    rs = factors.pt2plane_residual(pts_s1, prob.str_mean, prob.str_normal)
    chi2_deg = ba_lambda2 * rs * rs
    bad_deg = (prob.str_type == STR_DEG) & (chi2_deg > tri_str_thresh * ba_lambda2)
    active_str = active_str & ~bad_deg

    state = run_stage(state, active_obs, active_str, use_huber, iters2)

    # stage-2 -> stage-3 gate: drop bad reprojection edges, drop Huber
    # (:797-825) — chi2/depth at the stage-2 state come from the carried
    # products, no extra residual pass.
    chi2_o, depth_ok = state[3][3], state[3][4]
    bad_obs = (chi2_o > chi2_th) | ~depth_ok
    active_obs = active_obs & ~bad_obs
    use_huber = jnp.array(False)

    state = run_stage(state, active_obs, active_str, use_huber, iters3)
    cam_q_f, cam_t_f, pts_f = state[0], state[1], state[2]

    # final classification (:837-894) from the final carried products
    chi2_f, depth_ok_f = state[3][3], state[3][4]
    obs_bad = prob.obs_valid & obs_exists & ((chi2_f > chi2_th) | ~depth_ok_f)
    rs_f = factors.pt2plane_residual(pts_f, prob.str_mean, prob.str_normal)
    chi2_deg_f = ba_lambda2 * rs_f * rs_f
    str_drop = (
        prob.pt_valid
        & (prob.str_type == STR_DEG)
        & (chi2_deg_f > tri_str_thresh * ba_lambda2)
    )
    cost_f = cost_from(
        state[3], cam_q_f, cam_t_f, pts_f, active_obs, active_str, use_huber
    )
    return BAResult(
        cam_q_f, cam_t_f, pts_f, obs_bad, str_drop, chi2_f, cost_f,
        state[5].astype(jnp.int32),
    )
