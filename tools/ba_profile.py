"""Empirical cost breakdown of one local-BA LM iteration on the real chip.

Times each stage of solve_local_ba's lm_iteration as a separate jit
(linearize, camera-system einsums, Schur+solve, cost pass) so the
7 ms/iteration budget (RESULTS.md) can be attributed instead of guessed.
Each timing uses an in-jit reduction sync and a two-point slope to cancel
tunnel dispatch latency.

Usage: python tools/ba_profile.py [--P 8192] [--L 16] [--MO 12]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gmmloc_tpu.utils.tpuenv import ensure_fast_tpu_env

ensure_fast_tpu_env()

import numpy as np


def timeit(fn, *args, reps=(2, 10)):
    """Two-point slope timing: run reps[0] and reps[1] chained calls,
    return (t1 - t0) / (reps[1] - reps[0])."""
    import jax

    outs = []
    for n in reps:
        t0 = time.perf_counter()
        s = 0.0
        for _ in range(n):
            s = s + fn(*args)
        float(s)  # forces completion of the chain
        outs.append(time.perf_counter() - t0)
    return (outs[1] - outs[0]) / (reps[1] - reps[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--P", type=int, default=8192)
    ap.add_argument("--L", type=int, default=16)
    ap.add_argument("--C", type=int, default=48)
    ap.add_argument("--MO", type=int, default=12)
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (sitecustomize pre-empts JAX_PLATFORMS)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    print("devices:", jax.devices())

    from gmmloc_tpu.config import euroc_v1_config
    from gmmloc_tpu.solver import factors, local_ba
    from ba_bench import build  # noqa: E402  (same dir)

    cfg = euroc_v1_config()
    cam = cfg.camera
    rng = np.random.default_rng(0)
    L, C, P, MO = args.L, args.C, args.P, args.MO
    prob = build(rng, cam, L, C, P, MO)
    dtype = jnp.float32
    use_bf16 = bool(args.bf16)

    free_mask = (jnp.arange(C) < L) & prob.cam_valid
    obs_exists = (prob.obs_cam >= 0) & prob.pt_valid[:, None]
    obs_on_free = obs_exists & (prob.obs_cam < L) & free_mask[
        jnp.clip(prob.obs_cam, 0, L - 1)
    ]
    onehot = (
        (prob.obs_cam[..., None] == jnp.arange(L)[None, None, :])
        & obs_on_free[..., None]
    ).astype(dtype)
    active_obs = prob.obs_valid & obs_exists

    huber_delta = jnp.where(
        prob.obs_stereo,
        jnp.sqrt(local_ba.CHI2_STEREO),
        jnp.sqrt(local_ba.CHI2_MONO),
    ).astype(dtype)

    # ---- stage jits --------------------------------------------------
    @jax.jit
    def j_linearize(cam_q, cam_t, pts):
        r, Jc, Jp, chi2, _ = local_ba._obs_terms(cam, prob, cam_q, cam_t, pts)
        return jnp.sum(r) + jnp.sum(Jc) + jnp.sum(Jp) + jnp.sum(chi2)

    def _terms(cam_q, cam_t, pts):
        r, Jc, Jp, chi2, _ = local_ba._obs_terms(cam, prob, cam_q, cam_t, pts)
        hw = factors.huber_weight(chi2, huber_delta)
        w = prob.obs_sigma2_inv * hw * active_obs.astype(dtype)
        if use_bf16:
            bf = jnp.bfloat16
            return Jc.astype(bf), Jp.astype(bf), w.astype(bf), r.astype(bf), onehot.astype(bf)
        return Jc, Jp, w, r, onehot

    ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)

    @jax.jit
    def j_point_blocks(cam_q, cam_t, pts):
        Jcb, Jpb, wb, rb, ohb = _terms(cam_q, cam_t, pts)
        H_pp = ein("pmai,pm,pmaj->pij", Jpb, wb, Jpb)
        b_p = ein("pmai,pm,pma->pi", Jpb, wb, rb)
        return jnp.sum(H_pp) + jnp.sum(b_p)

    @jax.jit
    def j_cam_blocks(cam_q, cam_t, pts):
        Jcb, Jpb, wb, rb, ohb = _terms(cam_q, cam_t, pts)
        H_cc = ein("pmai,pm,pmaj,pml->lij", Jcb, wb, Jcb, ohb)
        b_c = ein("pmai,pm,pma,pml->li", Jcb, wb, rb, ohb)
        return jnp.sum(H_cc) + jnp.sum(b_c)

    @jax.jit
    def j_coupling(cam_q, cam_t, pts):
        Jcb, Jpb, wb, rb, ohb = _terms(cam_q, cam_t, pts)
        U = ein("pmai,pm,pmaj,pml->plij", Jcb, wb, Jpb, ohb)
        return jnp.sum(U)

    # full schur: U, T, S_red, b_red, solve
    @jax.jit
    def j_schur_solve(cam_q, cam_t, pts, lam):
        Jcb, Jpb, wb, rb, ohb = _terms(cam_q, cam_t, pts)
        H_pp = ein("pmai,pm,pmaj->pij", Jpb, wb, Jpb)
        b_p = ein("pmai,pm,pma->pi", Jpb, wb, rb)
        H_cc = ein("pmai,pm,pmaj,pml->lij", Jcb, wb, Jcb, ohb)
        b_c = ein("pmai,pm,pma,pml->li", Jcb, wb, rb, ohb)
        U = ein("pmai,pm,pmaj,pml->plij", Jcb, wb, Jpb, ohb)
        eyep = jnp.eye(3, dtype=dtype)
        H_pp_d = H_pp + lam * (
            jnp.einsum("pii->p", H_pp)[:, None, None] / 3.0 + 1e-9
        ) * eyep
        Hpp_inv, _ = local_ba._inv3(H_pp_d)
        T = jnp.einsum("plij,pjk->plik", U, Hpp_inv)
        S_red = -jnp.einsum("plij,pmkj->lmik", T, U)
        eyec = jnp.eye(6, dtype=dtype)
        S_red = S_red.at[jnp.arange(L), jnp.arange(L)].add(
            H_cc + lam * (jnp.einsum("lii->l", H_cc)[:, None, None] / 6.0 + 1e-9) * eyec
        )
        b_red = b_c - jnp.einsum("plij,pj->li", T, b_p)
        S_flat = S_red.transpose(0, 2, 1, 3).reshape(L * 6, L * 6)
        dc = -jnp.linalg.solve(S_flat, b_red.reshape(-1))
        return jnp.sum(dc)

    # flattened-GEMM formulation: Z[p, n, l*6+i] = onehot[p,m,l]*Jc[p,m,a,i]
    # with n = m*3+a. All reductions become large clean matmuls:
    #   H_cc_full = Z^T W Z   ((96, P*N) @ (P*N, 96))
    #   U_full    = batched (P, 96, N) @ (P, N, 3)
    #   S_schur   = T-flat (96, P*3) @ (P*3, 96)
    @jax.jit
    def j_schur_solve_flat(cam_q, cam_t, pts, lam):
        Jcb, Jpb, wb, rb, ohb = _terms(cam_q, cam_t, pts)
        N = MO * 3
        # (P, MO, 3, L, 6) -> (P, N, 96); built lazily inside the matmuls
        Z = (ohb[:, :, None, :, None] * Jcb[:, :, :, None, :]).reshape(P, N, L * 6)
        Wn = jnp.repeat(wb, 3, axis=-1).reshape(P, N)  # weight per row
        Jpf = Jpb.reshape(P, N, 3)
        rf = rb.reshape(P, N)
        ZW = Z * Wn[..., None]
        Zf = Z.reshape(P * N, L * 6)
        ZWf = ZW.reshape(P * N, L * 6)
        H_cc_full = ein("nc,nd->cd", ZWf, Zf)                   # (96,96)
        b_c_full = ein("nc,n->c", ZWf, rf.reshape(-1))          # (96,)
        H_pp = ein("pni,pn,pnj->pij", Jpf, Wn, Jpf)
        b_p = ein("pni,pn->pi", Jpf * Wn[..., None], rf)
        U = ein("pnc,pnj->pcj", ZW, Jpf)                        # (P,96,3)
        eyep = jnp.eye(3, dtype=dtype)
        H_pp_d = H_pp + lam * (
            jnp.einsum("pii->p", H_pp)[:, None, None] / 3.0 + 1e-9
        ) * eyep
        Hpp_inv, _ = local_ba._inv3(H_pp_d)
        T = ein("pcj,pjk->pck", U, Hpp_inv.astype(U.dtype))     # (P,96,3)
        S = H_cc_full - ein("pcj,pdj->cd", T, U)
        # LM damping on the 6x6 camera diagonal blocks
        diag = jnp.einsum("cc->c", H_cc_full)
        blk = diag.reshape(L, 6).mean(-1)
        S = S + lam * jnp.repeat(blk + 1e-9, 6)[:, None] * jnp.eye(L * 6, dtype=dtype)
        b_red = b_c_full - ein("pcj,pj->c", T, b_p)
        dc = -jnp.linalg.solve(S, b_red)
        return jnp.sum(dc)

    # the 96x96 dense solve alone
    Sf = np.random.default_rng(1).normal(size=(L * 6, L * 6)).astype(np.float32)
    Sf = Sf @ Sf.T + np.eye(L * 6, dtype=np.float32) * (L * 6)
    bf_ = np.random.default_rng(2).normal(size=(L * 6,)).astype(np.float32)
    Sfj, bfj = jnp.array(Sf), jnp.array(bf_)

    @jax.jit
    def j_dense_solve(S, b, s):
        return jnp.sum(jnp.linalg.solve(S + s * 0.0, b)) + s * 0.0

    @jax.jit
    def j_cost(cam_q, cam_t, pts):
        chi2, _ = local_ba._obs_residuals(cam, prob, cam_q, cam_t, pts)
        return jnp.sum(jnp.where(active_obs, chi2, 0.0))

    # full lm iteration for reference
    solve = functools.partial(
        local_ba.solve_local_ba, cam, prob, L,
        iters1=1, iters2=0, iters3=0, use_bf16=use_bf16,
    )

    q0, t0, p0 = prob.cam_q, prob.cam_t, prob.pts
    lam = jnp.array(1e-4, dtype)

    rows = [
        ("linearize (r,Jc,Jp)", lambda s: j_linearize(q0, t0 + s * 1e-12, p0)),
        ("point blocks Hpp,bp", lambda s: j_point_blocks(q0, t0 + s * 1e-12, p0)),
        ("cam blocks Hcc,bc", lambda s: j_cam_blocks(q0, t0 + s * 1e-12, p0)),
        ("coupling U", lambda s: j_coupling(q0, t0 + s * 1e-12, p0)),
        ("full schur+solve", lambda s: j_schur_solve(q0, t0 + s * 1e-12, p0, lam)),
        ("flat schur+solve", lambda s: j_schur_solve_flat(q0, t0 + s * 1e-12, p0, lam)),
        ("96x96 dense solve", lambda s: j_dense_solve(Sfj, bfj + s * 1e-12, jnp.float32(0))),
        ("cost pass", lambda s: j_cost(q0, t0 + s * 1e-12, p0)),
    ]
    print(f"shapes: L={L} C={C} P={P} MO={MO} bf16={use_bf16}")
    for name, fn in rows:
        # wrap: fn takes a scalar perturbation so chained calls can't be CSE'd
        def chained(n):
            t0_ = time.perf_counter()
            s = jnp.float32(0.0)
            for i in range(n):
                s = fn(s * 1e-30)
            float(s)
            return time.perf_counter() - t0_

        chained(1)  # compile
        a, b = chained(3), chained(13)
        print(f"{name:24s} {(b - a) / 10 * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
