"""Bundle adjustment via Schur-complement Levenberg–Marquardt.

Replaces g2o's BlockSolver_6_3 + sparse Cholesky pipeline
(Thirdparty/g2o/g2o/core/block_solver.hpp) used by
Optimizer::{BundleAdjustment, LocalBundleAdjustment, GlobalBundleAdjustemnt}
(reference src/Optimizer.cc:50-307, 772-1242) — including the reference's
MapAruco SE3 vertices with 4 reprojection corner edges each (weight 25*I2,
Huber sqrt(5.991), Optimizer.cc:168-234).

TPU-first formulation:
  * observations are a flat padded edge list (kf_idx, pt_idx, uv, info, mask)
    — every gather/scatter is a fixed-shape segment op;
  * per-point 3x3 Hessian blocks are reduced in parallel (the landmark
    marginalization is embarrassingly parallel);
  * the reduced camera system S (6K x 6K, K = #keyframes in the problem) is
    formed DENSELY with scatter-adds and solved with Cholesky — for local BA
    K <= ~100 so S <= 600x600: ideal MXU material;
  * marker vertices (6 dof) join the camera system as extra blocks: they are
    few (<= 64) and observed by many cameras, so they sit on the "dense" side
    of the Schur split rather than being marginalized;
  * in the distributed setting the same edge lists are sharded over a mesh
    axis and every `segment_sum` gains a `psum` (see parallel/dist_ba.py).

All shapes static; masks make padded edges/slots free.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import se3_exp, se3_compose
from orb_slam2_aruco_tpu.optim import residuals as res
from orb_slam2_aruco_tpu.optim.lm import diag_embed
from orb_slam2_aruco_tpu.optim.segsum import segment_sum_sorted


class BAProblem(NamedTuple):
    """Fixed-shape bundle adjustment problem.

    K cameras, L points, M markers, E point-edges, F marker-edges (= 4 * number
    of camera-marker observations, one edge per corner).
    """

    # states
    Rcw: jnp.ndarray            # [K, 3, 3]
    tcw: jnp.ndarray            # [K, 3]
    points: jnp.ndarray         # [L, 3]
    Rwm: jnp.ndarray            # [M, 3, 3]
    twm: jnp.ndarray            # [M, 3]
    marker_side: jnp.ndarray    # [M] side length
    # point edges
    e_kf: jnp.ndarray           # [E] int32 camera index
    e_pt: jnp.ndarray           # [E] int32 point index
    e_uv: jnp.ndarray           # [E, 2] observation
    e_info: jnp.ndarray         # [E] information scale (1/sigma^2)
    e_mask: jnp.ndarray         # [E] float validity
    # marker corner edges (corner index = edge % 4 handled by caller layout)
    m_kf: jnp.ndarray           # [F] int32 camera index
    m_marker: jnp.ndarray       # [F] int32 marker index
    m_corner: jnp.ndarray       # [F] int32 corner index 0..3
    m_uv: jnp.ndarray           # [F, 2]
    m_info: jnp.ndarray         # [F] information scale (25 = edge weight)
    m_mask: jnp.ndarray         # [F]
    # which states are free (1.0) vs fixed (0.0)
    cam_free: jnp.ndarray       # [K]
    pt_free: jnp.ndarray        # [L]
    marker_free: jnp.ndarray    # [M]


class BAResult(NamedTuple):
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    points: jnp.ndarray
    Rwm: jnp.ndarray
    twm: jnp.ndarray
    chi2: jnp.ndarray
    edge_chi2: jnp.ndarray      # [E] final per-point-edge chi2 (for outlier erase)
    medge_chi2: jnp.ndarray     # [F]


def _corner_local(marker_side, corner_idx):
    """Canonical corner coordinates for gathered corner indices.
    marker_side: [F]; corner_idx: [F] in 0..3 -> [F, 3]."""
    h = marker_side / 2.0
    signs_x = jnp.asarray([-1.0, 1.0, 1.0, -1.0])
    signs_y = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    sx = signs_x[corner_idx]
    sy = signs_y[corner_idx]
    return jnp.stack([sx * h, sy * h, jnp.zeros_like(h)], axis=-1)


def _point_edge_terms(p: BAProblem, cam: Camera, huber_delta, use_huber=True):
    """Residuals + Jacobians for all point edges. Returns r [E,2], Jc [E,2,6],
    Jp [E,2,3], w [E] (info * huber * mask)."""
    Rcw = p.Rcw[p.e_kf]
    tcw = p.tcw[p.e_kf]
    X = p.points[p.e_pt]
    r, p_cam = res.reproj_residual(Rcw, tcw, X, p.e_uv, cam.fx, cam.fy, cam.cx, cam.cy)
    Jc = res.jac_pose(p_cam, cam.fx, cam.fy, cam.cx, cam.cy)
    Jp = res.jac_point(p_cam, Rcw, cam.fx, cam.fy, cam.cx, cam.cy)
    chi2 = jnp.sum(r * r, axis=-1) * p.e_info
    hw = res.huber_weight(chi2, huber_delta) if use_huber else jnp.ones_like(chi2)
    w = p.e_mask * p.e_info * hw
    w = jnp.where(p_cam[..., 2] <= 0.02, 0.0, w)
    # fixed cameras / points: zero their jacobians (edge still constrains the
    # other endpoint)
    Jc = Jc * p.cam_free[p.e_kf][:, None, None]
    Jp = Jp * p.pt_free[p.e_pt][:, None, None]
    return r, Jc, Jp, w, chi2


def _marker_edge_terms(p: BAProblem, cam: Camera, huber_delta, use_huber=True):
    """Residuals + Jacobians for marker corner edges. Returns r [F,2],
    Jc [F,2,6], Jm [F,2,6], w [F]."""
    Rcw = p.Rcw[p.m_kf]
    tcw = p.tcw[p.m_kf]
    Rwm = p.Rwm[p.m_marker]
    twm = p.twm[p.m_marker]
    side = p.marker_side[p.m_marker]
    cl = _corner_local(side, p.m_corner)                       # [F, 3]
    cw = jnp.einsum("fij,fj->fi", Rwm, cl) + twm               # corner in world
    r, p_cam = res.reproj_residual(Rcw, tcw, cw, p.m_uv, cam.fx, cam.fy, cam.cx, cam.cy)
    Jc = res.jac_pose(p_cam, cam.fx, cam.fy, cam.cx, cam.cy)
    Jm = res.jac_marker_world(p_cam, Rcw, cw, cam.fx, cam.fy, cam.cx, cam.cy)
    chi2 = jnp.sum(r * r, axis=-1) * p.m_info
    hw = res.huber_weight(chi2, huber_delta) if use_huber else jnp.ones_like(chi2)
    w = p.m_mask * p.m_info * hw
    w = jnp.where(p_cam[..., 2] <= 0.02, 0.0, w)
    Jc = Jc * p.cam_free[p.m_kf][:, None, None]
    Jm = Jm * p.marker_free[p.m_marker][:, None, None]
    return r, Jc, Jm, w, chi2


def _total_chi2(p: BAProblem, cam: Camera):
    Rcw = p.Rcw[p.e_kf]
    tcw = p.tcw[p.e_kf]
    r, pc = res.reproj_residual(
        Rcw, tcw, p.points[p.e_pt], p.e_uv, cam.fx, cam.fy, cam.cx, cam.cy
    )
    c_e = jnp.sum(r * r, axis=-1) * p.e_info
    valid_e = p.e_mask * (pc[..., 2] > 0.02)
    Rcw = p.Rcw[p.m_kf]
    tcw = p.tcw[p.m_kf]
    cl = _corner_local(p.marker_side[p.m_marker], p.m_corner)
    cw = jnp.einsum("fij,fj->fi", p.Rwm[p.m_marker], cl) + p.twm[p.m_marker]
    rm, pcm = res.reproj_residual(Rcw, tcw, cw, p.m_uv, cam.fx, cam.fy, cam.cx, cam.cy)
    c_m = jnp.sum(rm * rm, axis=-1) * p.m_info
    valid_m = p.m_mask * (pcm[..., 2] > 0.02)
    return jnp.sum(c_e * valid_e) + jnp.sum(c_m * valid_m), c_e, c_m


def ba_solve(
    p: BAProblem,
    cam: Camera,
    iters: int = 10,
    huber_delta: float = 2.4477,
    use_huber: bool = True,
    lam0: float = 1e-4,
    psum_axis: Optional[str] = None,
) -> BAResult:
    """Run LM with Schur complement. If `psum_axis` is given, the function is
    being called inside shard_map with edges sharded along that mesh axis: all
    cross-edge reductions gain a psum so every device sees the global normal
    equations (states are replicated)."""
    K = p.Rcw.shape[0]
    M = p.Rwm.shape[0]
    D = 6 * (K + M)  # dense system dimension: cameras + markers

    def maybe_psum(x):
        if psum_axis is None:
            return x
        return jax.lax.psum(x, psum_axis)

    def build_and_step(state, lam):
        Rcw, tcw, points, Rwm, twm = state
        pp = p._replace(Rcw=Rcw, tcw=tcw, points=points, Rwm=Rwm, twm=twm)
        r_e, Jc_e, Jp_e, w_e, _ = _point_edge_terms(pp, cam, huber_delta, use_huber)
        r_m, Jc_m, Jm_m, w_m, _ = _marker_edge_terms(pp, cam, huber_delta, use_huber)

        # --- landmark (point) blocks -------------------------------------
        # Hpp[l] = sum_e w JpT Jp (3x3); bp[l] = -sum w JpT r
        Hpp = segment_sum_sorted(
            jnp.einsum("fei,f,fej->fij", Jp_e, w_e, Jp_e), p.e_pt, num_segments=points.shape[0]
        )
        bp = segment_sum_sorted(
            -jnp.einsum("fei,f,fe->fi", Jp_e, w_e, r_e), p.e_pt, num_segments=points.shape[0]
        )
        Hpp = maybe_psum(Hpp)
        bp = maybe_psum(bp)
        # damp + invert per point
        dpp = jnp.maximum(jnp.einsum("lii->li", Hpp), 1e-10)
        Hpp_d = Hpp + lam * diag_embed(dpp) + 1e-9 * jnp.eye(3)
        Hpp_inv = jnp.linalg.inv(Hpp_d)
        Hpp_inv = jnp.where(
            jnp.isfinite(Hpp_inv), Hpp_inv, jnp.zeros_like(Hpp_inv)
        )

        # --- camera/marker diagonal blocks -------------------------------
        Hcc = segment_sum_sorted(
            jnp.einsum("fei,f,fej->fij", Jc_e, w_e, Jc_e), p.e_kf, num_segments=K
        ) + segment_sum_sorted(
            jnp.einsum("fei,f,fej->fij", Jc_m, w_m, Jc_m), p.m_kf, num_segments=K
        )
        bc = segment_sum_sorted(
            -jnp.einsum("fei,f,fe->fi", Jc_e, w_e, r_e), p.e_kf, num_segments=K
        ) + segment_sum_sorted(
            -jnp.einsum("fei,f,fe->fi", Jc_m, w_m, r_m), p.m_kf, num_segments=K
        )
        Hmm = segment_sum_sorted(
            jnp.einsum("fei,f,fej->fij", Jm_m, w_m, Jm_m), p.m_marker, num_segments=M
        )
        bm = segment_sum_sorted(
            -jnp.einsum("fei,f,fe->fi", Jm_m, w_m, r_m), p.m_marker, num_segments=M
        )

        # camera-marker coupling blocks (dense side, scatter into big S)
        Hcm_blocks = jnp.einsum("fei,f,fej->fij", Jc_m, w_m, Jm_m)  # [F, 6, 6]

        # --- Schur: S = Hcc_big - W Hpp^-1 W^T ---------------------------
        # W blocks: per point-edge camera-point coupling [E, 6, 3]
        Wcp = jnp.einsum("fei,f,fej->fij", Jc_e, w_e, Jp_e)
        # For each edge pair (e1, e2) sharing a point l, S gets
        # -Wcp[e1] Hpp_inv[l] Wcp[e2]^T at (kf(e1), kf(e2)). Materializing all
        # pairs is O(E * max_obs); instead use the standard identity with
        # per-point aggregation: Y[e] = Wcp[e] @ Hpp_inv[pt(e)], then
        # S -= sum_{e1,e2 same pt} Y[e1] Wcp[e2]^T. We aggregate per point:
        # A[l] = sum_{e: pt(e)=l} scatter of Y/W products requires pairwise
        # terms — done via dense [K*6, L*3] matrices when L is small, or via
        # the camera-pair scatter below.
        #
        # Dense-W formulation (local BA: K<=~100, L<=~12k -> W is [6K, 3L]
        # ~ 600 x 36000 f32 = 86 MB; acceptable on HBM, matmuls on MXU):
        Yl = jnp.einsum("fij,fjk->fik", Wcp, Hpp_inv[p.e_pt])  # [E, 6, 3]
        # The pairwise Schur term needs, for each point, the product of every
        # pair of observing cameras' coupling blocks. Build dense per-(camera,
        # point) block matrices by scatter, then one big MXU contraction over
        # the point axis: S_cc = -Y W^T. [K, L, 6, 3] each.
        L = points.shape[0]
        kl_ids = p.e_kf * L + p.e_pt
        Wmat = segment_sum_sorted(Wcp, kl_ids, K * L).reshape(K, L, 6, 3)
        Ymat = segment_sum_sorted(Yl, kl_ids, K * L).reshape(K, L, 6, 3)
        Wmat = maybe_psum(Wmat)
        Ymat = maybe_psum(Ymat)
        S_cc = -jnp.einsum("alik,bljk->abij", Ymat, Wmat)  # [K, K, 6, 6]
        Hcc = maybe_psum(Hcc)
        bc = maybe_psum(bc)
        Hmm = maybe_psum(Hmm)
        bm = maybe_psum(bm)
        S_cc = S_cc.at[jnp.arange(K), jnp.arange(K)].add(Hcc)
        # reduced rhs: bc_red = bc - Y bp
        bc_red = bc - jnp.einsum("alik,lk->ai", Ymat, bp)

        # --- assemble dense system over cameras + markers ----------------
        S = jnp.zeros((D, D), dtype=r_e.dtype)
        S = S.reshape(K + M, 6, K + M, 6).transpose(0, 2, 1, 3)  # [K+M, K+M, 6, 6]
        S = S.at[:K, :K].add(S_cc)
        S = S.at[jnp.arange(K, K + M), jnp.arange(K, K + M)].add(Hmm)
        # camera-marker couplings (not affected by point marginalization)
        Hcm_sum = maybe_psum(
            segment_sum_sorted(
                Hcm_blocks, p.m_kf * M + p.m_marker, num_segments=K * M
            ).reshape(K, M, 6, 6)
        )
        S = S.at[:K, K:].add(Hcm_sum)
        S = S.at[K:, :K].add(jnp.swapaxes(jnp.swapaxes(Hcm_sum, 0, 1), -1, -2))
        b_all = jnp.concatenate([bc_red, bm], axis=0)  # [K+M, 6]

        # damping on the dense side
        Sd = S.transpose(0, 2, 1, 3).reshape(D, D)
        diag = jnp.maximum(jnp.diagonal(Sd), 1e-10)
        free_vec = jnp.concatenate(
            [jnp.repeat(p.cam_free, 6), jnp.repeat(p.marker_free, 6)]
        )
        # fixed states: unit diagonal rows/cols, zero rhs -> dx = 0
        Sd = Sd * free_vec[:, None] * free_vec[None, :]
        Sd = Sd + jnp.diag(lam * diag + 1e-8 + (1.0 - free_vec))
        rhs = b_all.reshape(D) * free_vec
        dx_dense = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sd), rhs
        )
        dx_dense = jnp.where(jnp.isfinite(dx_dense), dx_dense, 0.0)
        dxc = dx_dense[: 6 * K].reshape(K, 6)
        dxm = dx_dense[6 * K:].reshape(M, 6)

        # --- back-substitute points --------------------------------------
        # dp[l] = Hpp_inv (bp - W^T dxc) ; W^T dxc aggregated over edges
        Wt_dxc = maybe_psum(
            segment_sum_sorted(
                jnp.einsum("fij,fi->fj", Wcp, dxc[p.e_kf]),
                p.e_pt,
                num_segments=L,
            )
        )
        dp = jnp.einsum("lij,lj->li", Hpp_inv, bp - Wt_dxc)
        dp = dp * p.pt_free[:, None]
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0)

        # --- apply updates ----------------------------------------------
        dRc, dtc = se3_exp(dxc)
        Rn, tn = se3_compose(dRc, dtc, Rcw, tcw)
        dRm, dtm = se3_exp(dxm)
        Rwm_n, twm_n = se3_compose(dRm, dtm, Rwm, twm)
        return (Rn, tn, points + dp, Rwm_n, twm_n)

    def lm_iter(it, carry):
        state, lam, chi2_cur = carry
        new_state = build_and_step(state, lam)
        pp = p._replace(
            Rcw=new_state[0], tcw=new_state[1], points=new_state[2],
            Rwm=new_state[3], twm=new_state[4],
        )
        chi2_new, _, _ = _total_chi2(pp, cam)
        chi2_new = maybe_psum(chi2_new)  # accept/reject must be global
        accept = chi2_new < chi2_cur
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(accept, n, o), new_state, state
        )
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e5)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        return state, lam, chi2_cur

    state0 = (p.Rcw, p.tcw, p.points, p.Rwm, p.twm)
    chi2_0, _, _ = _total_chi2(p, cam)
    chi2_0 = maybe_psum(chi2_0)
    state, _, chi2 = jax.lax.fori_loop(
        0, iters, lm_iter, (state0, jnp.float32(lam0), chi2_0)
    )
    pp = p._replace(Rcw=state[0], tcw=state[1], points=state[2], Rwm=state[3], twm=state[4])
    chi2_final, c_e, c_m = _total_chi2(pp, cam)
    chi2_final = maybe_psum(chi2_final)
    return BAResult(
        Rcw=state[0], tcw=state[1], points=state[2], Rwm=state[3], twm=state[4],
        chi2=chi2_final, edge_chi2=c_e, medge_chi2=c_m,
    )
