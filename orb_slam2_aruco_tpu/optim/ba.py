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


class _SegPlan(NamedTuple):
    """Reusable segment-reduction plan: the edge->segment ids of a BA problem
    never change across LM/CG iterations, so the argsort + searchsorted of
    segment_sum_sorted is done ONCE and replayed as gather+cumsum+diff."""

    perm: jnp.ndarray    # [E] sort order of the ids
    left: jnp.ndarray    # [S] first sorted position of each segment
    right: jnp.ndarray   # [S] one-past-last sorted position


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate/determinant) — the LU path
    jnp.linalg.inv lowers to runs of sequential triangular solves on TPU, paid
    once per landmark per LM iteration."""
    c00 = M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1]
    c01 = M[..., 0, 2] * M[..., 2, 1] - M[..., 0, 1] * M[..., 2, 2]
    c02 = M[..., 0, 1] * M[..., 1, 2] - M[..., 0, 2] * M[..., 1, 1]
    c10 = M[..., 1, 2] * M[..., 2, 0] - M[..., 1, 0] * M[..., 2, 2]
    c11 = M[..., 0, 0] * M[..., 2, 2] - M[..., 0, 2] * M[..., 2, 0]
    c12 = M[..., 0, 2] * M[..., 1, 0] - M[..., 0, 0] * M[..., 1, 2]
    c20 = M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]
    c21 = M[..., 0, 1] * M[..., 2, 0] - M[..., 0, 0] * M[..., 2, 1]
    c22 = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    det = M[..., 0, 0] * c00 + M[..., 0, 1] * c10 + M[..., 0, 2] * c20
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def _make_plan(ids, num_segments: int) -> _SegPlan:
    idsx = jnp.where((ids >= 0) & (ids < num_segments), ids, num_segments)
    perm = jnp.argsort(idsx)
    ss = idsx[perm]
    rng = jnp.arange(num_segments, dtype=idsx.dtype)
    return _SegPlan(
        perm=perm,
        left=jnp.searchsorted(ss, rng, side="left"),
        right=jnp.searchsorted(ss, rng, side="right"),
    )


def _seg_reduce(plan: _SegPlan, vals, num_segments: int):
    E = vals.shape[0]
    tail = vals.shape[1:]
    sv = vals.reshape(E, -1)[plan.perm]
    cs = jnp.cumsum(sv.astype(jnp.float32), axis=0)
    cs0 = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], axis=0)
    out = cs0[plan.right] - cs0[plan.left]
    return out.reshape((num_segments,) + tail).astype(vals.dtype)


def ba_solve(
    p: BAProblem,
    cam: Camera,
    iters: int = 10,
    huber_delta: float = 2.4477,
    use_huber: bool = True,
    lam0: float = 1e-4,
    psum_axis: Optional[str] = None,
    solver: str = "auto",
    cg_iters: int = 32,
    edges_by_point: bool = False,
) -> BAResult:
    """Run LM with Schur complement. If `psum_axis` is given, the function is
    being called inside shard_map with edges sharded along that mesh axis: all
    cross-edge reductions gain a psum so every device sees the global normal
    equations (states are replicated).

    edges_by_point (distributed only): promises that every point's edges
    live on ONE shard (parallel.dist_ba.partition_edges_by_point). The
    landmark-sized CG intermediate u = W^T x then needs NO collective (it is
    owner-complete locally and zero elsewhere), and the camera/marker-sized
    matvec contributions FUSE into a single ~6(K+M)-float psum per CG step —
    the per-step all-reduce payload drops from L-sized (hundreds of KB) to
    ~10 KB and the collective count from 4 to 1, which is what makes the CG
    latency-bound DCN cost model close (BASELINE.md).

    solver: "dense" assembles the reduced camera system S explicitly and
    Cholesky-solves it — right for small windows (local BA). "cg" never forms
    S: the Schur-complement matvec is evaluated EDGE-WISE (two segment
    reductions per product) inside a block-Jacobi-preconditioned CG — O(E)
    per CG step regardless of K, which is what makes whole-map BA (K = 256,
    L = 20k) and its multi-chip sharding tractable (the dense path's [K, L]
    block matrices and the 6(K+M) Cholesky are quadratic walls). "auto"
    picks CG when K > 32."""
    K = p.Rcw.shape[0]
    M = p.Rwm.shape[0]
    D = 6 * (K + M)  # dense system dimension: cameras + markers
    use_cg = solver == "cg" or (solver == "auto" and K > 32)

    def maybe_psum(x):
        if psum_axis is None:
            return x
        return jax.lax.psum(x, psum_axis)

    # segment-reduction plans: the edge->state incidences never change, so
    # the argsort/searchsorted happen ONCE per solve, not per reduction
    Lp = p.points.shape[0]
    plan_pt = _make_plan(p.e_pt, Lp)
    plan_kf = _make_plan(p.e_kf, K)
    plan_mkf = _make_plan(p.m_kf, K)
    plan_mm = _make_plan(p.m_marker, M)
    if not use_cg:
        # dense-branch reduction plans (constant incidences — sorting these
        # inside build_and_step would pay an argsort per LM iteration)
        plan_kl = _make_plan(p.e_kf * Lp + p.e_pt, K * Lp)
        plan_km = _make_plan(p.m_kf * M + p.m_marker, K * M)

    def build_and_step(state, lam):
        Rcw, tcw, points, Rwm, twm = state
        pp = p._replace(Rcw=Rcw, tcw=tcw, points=points, Rwm=Rwm, twm=twm)
        r_e, Jc_e, Jp_e, w_e, _ = _point_edge_terms(pp, cam, huber_delta, use_huber)
        r_m, Jc_m, Jm_m, w_m, _ = _marker_edge_terms(pp, cam, huber_delta, use_huber)
        L = points.shape[0]

        # --- landmark (point) blocks -------------------------------------
        # Hpp[l] = sum_e w JpT Jp (3x3); bp[l] = -sum w JpT r
        Hpp = _seg_reduce(
            plan_pt, jnp.einsum("fei,f,fej->fij", Jp_e, w_e, Jp_e), L
        )
        bp = _seg_reduce(
            plan_pt, -jnp.einsum("fei,f,fe->fi", Jp_e, w_e, r_e), L
        )
        Hpp = maybe_psum(Hpp)
        bp = maybe_psum(bp)
        # damp + invert per point
        dpp = jnp.maximum(jnp.einsum("lii->li", Hpp), 1e-10)
        Hpp_d = Hpp + lam * diag_embed(dpp) + 1e-9 * jnp.eye(3)
        Hpp_inv = _inv3x3(Hpp_d)
        Hpp_inv = jnp.where(
            jnp.isfinite(Hpp_inv), Hpp_inv, jnp.zeros_like(Hpp_inv)
        )

        # --- camera/marker diagonal blocks -------------------------------
        Hcc = _seg_reduce(
            plan_kf, jnp.einsum("fei,f,fej->fij", Jc_e, w_e, Jc_e), K
        ) + _seg_reduce(
            plan_mkf, jnp.einsum("fei,f,fej->fij", Jc_m, w_m, Jc_m), K
        )
        bc = _seg_reduce(
            plan_kf, -jnp.einsum("fei,f,fe->fi", Jc_e, w_e, r_e), K
        ) + _seg_reduce(
            plan_mkf, -jnp.einsum("fei,f,fe->fi", Jc_m, w_m, r_m), K
        )
        Hmm = _seg_reduce(
            plan_mm, jnp.einsum("fei,f,fej->fij", Jm_m, w_m, Jm_m), M
        )
        bm = _seg_reduce(
            plan_mm, -jnp.einsum("fei,f,fe->fi", Jm_m, w_m, r_m), M
        )
        Hcc = maybe_psum(Hcc)
        bc = maybe_psum(bc)
        Hmm = maybe_psum(Hmm)
        bm = maybe_psum(bm)

        # W blocks: per point-edge camera-point coupling [E, 6, 3]
        Wcp = jnp.einsum("fei,f,fej->fij", Jc_e, w_e, Jp_e)

        free_c = p.cam_free
        free_m = p.marker_free
        diag_c = jnp.maximum(jnp.einsum("kii->ki", Hcc), 1e-10)
        diag_m = jnp.maximum(jnp.einsum("mii->mi", Hmm), 1e-10)

        # reduced rhs: bc_red = bc - W Hpp^-1 bp (edge-wise, no [K, L] blocks)
        hb = jnp.einsum("lij,lj->li", Hpp_inv, bp)                 # [L, 3]
        bc_red = bc - maybe_psum(_seg_reduce(
            plan_kf, jnp.einsum("fij,fj->fi", Wcp, hb[p.e_pt]), K
        ))

        if use_cg:
            # ---- matrix-free Schur solve: block-Jacobi PCG ---------------
            def matvec(xc, xm):
                xc = xc * free_c[:, None]
                xm = xm * free_m[:, None]
                yc0 = jnp.einsum("kij,kj->ki", Hcc, xc)   # globally-summed Hcc
                ym0 = jnp.einsum("mij,mj->mi", Hmm, xm)
                # camera<->marker coupling via marker edges (local contribs)
                t_m = jnp.einsum("fej,fj->fe", Jm_m, xm[p.m_marker])
                yc_mk = _seg_reduce(
                    plan_mkf,
                    jnp.einsum("fei,fe,f->fi", Jc_m, t_m, w_m), K,
                )
                t_c = jnp.einsum("fei,fi->fe", Jc_m, xc[p.m_kf])
                ym_mk = _seg_reduce(
                    plan_mm,
                    jnp.einsum("fej,fe,f->fj", Jm_m, t_c, w_m), M,
                )
                # Schur subtraction: W Hpp^-1 W^T xc, two segment reductions
                u = _seg_reduce(
                    plan_pt, jnp.einsum("fij,fi->fj", Wcp, xc[p.e_kf]), L
                )                                                 # [L, 3]
                if not edges_by_point:
                    # edges of one point may be spread over shards: the
                    # landmark intermediate needs the (L-sized!) collective
                    u = maybe_psum(u)
                # else: u is owner-complete locally and zero elsewhere, so
                # the camera-side reduction below already sums to the global
                # value across shards — no landmark-sized collective
                s = jnp.einsum("lij,lj->li", Hpp_inv, u)
                yc_sch = _seg_reduce(
                    plan_kf, jnp.einsum("fij,fj->fi", Wcp, s[p.e_pt]), K
                )
                if edges_by_point and psum_axis is not None:
                    # ONE fused camera/marker-sized psum per CG step
                    packed = jnp.concatenate(
                        [(yc_mk - yc_sch).reshape(-1), ym_mk.reshape(-1)]
                    )
                    packed = jax.lax.psum(packed, psum_axis)
                    yc = yc0 + packed[: 6 * K].reshape(K, 6)
                    ym = ym0 + packed[6 * K:].reshape(M, 6)
                else:
                    yc = yc0 + maybe_psum(yc_mk) - maybe_psum(yc_sch)
                    ym = ym0 + maybe_psum(ym_mk)
                # LM damping; fixed states act as identity rows
                yc = (yc + lam * diag_c * xc + 1e-8 * xc) * free_c[:, None]
                ym = (ym + lam * diag_m * xm + 1e-8 * xm) * free_m[:, None]
                return yc, ym

            Pc = jnp.linalg.inv(
                Hcc + diag_embed(lam * diag_c) + 1e-7 * jnp.eye(6)
            )
            Pm = jnp.linalg.inv(
                Hmm + diag_embed(lam * diag_m) + 1e-7 * jnp.eye(6)
            )

            def precond(rc, rm):
                return (
                    jnp.einsum("kij,kj->ki", Pc, rc) * free_c[:, None],
                    jnp.einsum("mij,mj->mi", Pm, rm) * free_m[:, None],
                )

            def dot(ac, am, bc2, bm2):
                return jnp.sum(ac * bc2) + jnp.sum(am * bm2)

            b_c = bc_red * free_c[:, None]
            b_m = bm * free_m[:, None]
            x_c = jnp.zeros_like(b_c)
            x_m = jnp.zeros_like(b_m)
            r_c, r_m = b_c, b_m
            z_c, z_m = precond(r_c, r_m)
            rz = dot(r_c, r_m, z_c, z_m)
            tol2 = 1e-8 * jnp.maximum(dot(b_c, b_m, b_c, b_m), 1e-20)

            def cg_cond(s):
                _, _, _, _, _, _, rz_, it = s
                return (it < cg_iters) & (rz_ > tol2)

            def cg_step(s):
                x_c, x_m, r_c, r_m, p_c, p_m, rz_, it = s
                Ap_c, Ap_m = matvec(p_c, p_m)
                alpha = rz_ / jnp.maximum(dot(p_c, p_m, Ap_c, Ap_m), 1e-20)
                x_c = x_c + alpha * p_c
                x_m = x_m + alpha * p_m
                r_c = r_c - alpha * Ap_c
                r_m = r_m - alpha * Ap_m
                z_c, z_m = precond(r_c, r_m)
                rz_new = dot(r_c, r_m, z_c, z_m)
                beta = rz_new / jnp.maximum(rz_, 1e-20)
                p_c = z_c + beta * p_c
                p_m = z_m + beta * p_m
                return x_c, x_m, r_c, r_m, p_c, p_m, rz_new, it + 1

            x_c, x_m, _, _, _, _, _, _ = jax.lax.while_loop(
                cg_cond, cg_step,
                (x_c, x_m, r_c, r_m, z_c, z_m, rz, jnp.int32(0)),
            )
            dxc = jnp.where(jnp.isfinite(x_c), x_c, 0.0)
            dxm = jnp.where(jnp.isfinite(x_m), x_m, 0.0)
        else:
            # ---- dense reduced camera system + Cholesky ------------------
            # S -= W Hpp^-1 W^T via per-(camera, point) block matrices and
            # one MXU contraction over the point axis (fine while K*L is
            # small — local BA windows)
            Yl = jnp.einsum("fij,fjk->fik", Wcp, Hpp_inv[p.e_pt])  # [E, 6, 3]
            Wmat = _seg_reduce(plan_kl, Wcp, K * L).reshape(K, L, 6, 3)
            Ymat = _seg_reduce(plan_kl, Yl, K * L).reshape(K, L, 6, 3)
            Wmat = maybe_psum(Wmat)
            Ymat = maybe_psum(Ymat)
            S_cc = -jnp.einsum("alik,bljk->abij", Ymat, Wmat)  # [K, K, 6, 6]
            S_cc = S_cc.at[jnp.arange(K), jnp.arange(K)].add(Hcc)

            # --- assemble dense system over cameras + markers -------------
            S = jnp.zeros((D, D), dtype=r_e.dtype)
            S = S.reshape(K + M, 6, K + M, 6).transpose(0, 2, 1, 3)
            S = S.at[:K, :K].add(S_cc)
            S = S.at[jnp.arange(K, K + M), jnp.arange(K, K + M)].add(Hmm)
            # camera-marker couplings (unaffected by point marginalization)
            Hcm_blocks = jnp.einsum("fei,f,fej->fij", Jc_m, w_m, Jm_m)
            Hcm_sum = maybe_psum(
                _seg_reduce(plan_km, Hcm_blocks, K * M).reshape(K, M, 6, 6)
            )
            S = S.at[:K, K:].add(Hcm_sum)
            S = S.at[K:, :K].add(
                jnp.swapaxes(jnp.swapaxes(Hcm_sum, 0, 1), -1, -2)
            )
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
        Wt_dxc = maybe_psum(_seg_reduce(
            plan_pt, jnp.einsum("fij,fi->fj", Wcp, dxc[p.e_kf]), L
        ))
        dp = jnp.einsum("lij,lj->li", Hpp_inv, bp - Wt_dxc)
        dp = dp * p.pt_free[:, None]
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0)

        # --- apply updates ----------------------------------------------
        dRc, dtc = se3_exp(dxc)
        Rn, tn = se3_compose(dRc, dtc, Rcw, tcw)
        dRm, dtm = se3_exp(dxm)
        Rwm_n, twm_n = se3_compose(dRm, dtm, Rwm, twm)
        return (Rn, tn, points + dp, Rwm_n, twm_n)

    def lm_cond(carry):
        _, _, _, it, stall = carry
        # early exit after two consecutive stalled iterations: LM only
        # accepts chi2-decreasing steps, so a stalled tail would return the
        # same state the full budget would (same contract as pose_opt);
        # the LM iteration is the dominant sequential cost of the mapping
        # phase, so typical 3-5-iteration convergence halves it
        return (it < iters) & (stall < 2)

    def lm_iter(carry):
        state, lam, chi2_cur, it, stall = carry
        new_state = build_and_step(state, lam)
        pp = p._replace(
            Rcw=new_state[0], tcw=new_state[1], points=new_state[2],
            Rwm=new_state[3], twm=new_state[4],
        )
        chi2_new, _, _ = _total_chi2(pp, cam)
        chi2_new = maybe_psum(chi2_new)  # accept/reject must be global
        accept = chi2_new < chi2_cur
        improved = chi2_new < chi2_cur * (1.0 - 1e-6)
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(accept, n, o), new_state, state
        )
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e5)
        chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
        # NOTE on stall accounting: rejected steps count toward the 2-stall
        # exit on purpose. The g2o-style alternative (rejections only stall
        # once lambda is high, so LM keeps re-damping) was tried in round 4
        # and measurably REGRESSED tracking robustness — the longer LM tail
        # reshapes marginal maps enough that relocalization on the aliased-
        # texture retrieval scene failed permanently (tests/test_retrieval
        # fixture: transient LOST at frame 20 became terminal). The conserva-
        # tive exit also keeps the mapping phase's dominant sequential cost
        # bounded; lam0 is configured per problem so mis-scaled-lam0 aborts
        # do not occur in practice.
        stall = jnp.where(improved, 0, stall + 1)
        return state, lam, chi2_cur, it + 1, stall

    state0 = (p.Rcw, p.tcw, p.points, p.Rwm, p.twm)
    chi2_0, _, _ = _total_chi2(p, cam)
    chi2_0 = maybe_psum(chi2_0)
    state, _, chi2, _, _ = jax.lax.while_loop(
        lm_cond, lm_iter,
        (state0, jnp.float32(lam0), chi2_0, jnp.int32(0), jnp.int32(0)),
    )
    pp = p._replace(Rcw=state[0], tcw=state[1], points=state[2], Rwm=state[3], twm=state[4])
    chi2_final, c_e, c_m = _total_chi2(pp, cam)
    chi2_final = maybe_psum(chi2_final)
    return BAResult(
        Rcw=state[0], tcw=state[1], points=state[2], Rwm=state[3], twm=state[4],
        chi2=chi2_final, edge_chi2=c_e, medge_chi2=c_m,
    )
