"""Pose-only optimization with point + fixed-marker corner edges.

Replaces Optimizer::PoseOptimization (reference src/Optimizer.cc:308-520) and
Optimizer::PoseOptimizationByAruco (:522-770): 4 rounds x 10 LM iterations;
after each round observations are reclassified inlier/outlier by the 5.991
chi2 gate; the Huber kernel is dropped from round 3 on. Marker corners enter
as 4 fixed-vertex reprojection edges per marker with information 25*I2.

Everything is fixed-shape and mask-driven — a single jit compilation serves
every frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import (
    orthonormalize,
    se3_compose,
    se3_exp,
)
from orb_slam2_aruco_tpu.optim import residuals as res
from orb_slam2_aruco_tpu.optim.lm import solve_damped


class PoseOptResult(NamedTuple):
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    inliers: jnp.ndarray      # [N] bool — final point-edge inlier classification
    n_inliers: jnp.ndarray    # scalar int
    chi2: jnp.ndarray         # final total chi2


def _point_terms(Rcw, tcw, pts_w, uv, w, cam: Camera, huber_delta, use_huber):
    r, p_cam = res.reproj_residual(Rcw, tcw, pts_w, uv, cam.fx, cam.fy, cam.cx, cam.cy)
    J = res.jac_pose(p_cam, cam.fx, cam.fy, cam.cx, cam.cy)  # [N, 2, 6]
    chi2 = jnp.sum(r * r, axis=-1) * w
    hw = jnp.where(use_huber, res.huber_weight(chi2, huber_delta), jnp.ones_like(chi2))
    wt = w * hw
    behind = p_cam[..., 2] <= 0.05
    wt = jnp.where(behind, 0.0, wt)
    H = jnp.einsum("nei,n,nej->ij", J, wt, J)
    b = -jnp.einsum("nei,n,ne->i", J, wt, r)
    return H, b, chi2


def optimize_pose(
    Rcw0,
    tcw0,
    cam: Camera,
    pts_w,          # [N, 3] world points
    uv,             # [N, 2] observed (undistorted) pixels
    mask,           # [N] float/bool validity
    inv_sigma2,     # [N] per-observation information scale (1/sigma^2 per octave)
    marker_corners_w=None,  # [M, 4, 3] world corners of tracked markers (fixed)
    marker_uv=None,         # [M, 4, 2] observed corners
    marker_mask=None,       # [M]
    marker_weight: float = 25.0,
    chi2_th: float = 5.991,
    huber_delta: float = 2.4477,
    rounds: int = 4,
    iters_per_round: int = 10,
    lam0: float = 1e-3,
) -> PoseOptResult:
    """Single-problem pose LM (vmap for batches)."""
    mask = mask.astype(jnp.float32)
    n_pts = pts_w.shape[0]
    have_markers = marker_corners_w is not None
    if have_markers:
        m_corners = marker_corners_w.reshape(-1, 3)          # [4M, 3]
        m_uv = marker_uv.reshape(-1, 2)
        m_mask = jnp.repeat(marker_mask.astype(jnp.float32), 4) * marker_weight
    else:
        m_corners = jnp.zeros((4, 3), dtype=pts_w.dtype)
        m_uv = jnp.zeros((4, 2), dtype=uv.dtype)
        m_mask = jnp.zeros((4,), dtype=jnp.float32)

    def build(Rcw, tcw, inlier_w, use_huber):
        w_pts = mask * inlier_w * inv_sigma2
        Hp, bp, chi2_p = _point_terms(
            Rcw, tcw, pts_w, uv, w_pts, cam, huber_delta, use_huber
        )
        Hm, bm, _ = _point_terms(
            Rcw, tcw, m_corners, m_uv, m_mask, cam, huber_delta, use_huber
        )
        return Hp + Hm, bp + bm, chi2_p

    def total_chi2(Rcw, tcw, inlier_w):
        r, p_cam = res.reproj_residual(
            Rcw, tcw, pts_w, uv, cam.fx, cam.fy, cam.cx, cam.cy
        )
        c = jnp.sum(r * r, axis=-1) * inv_sigma2
        rm, _ = res.reproj_residual(
            Rcw, tcw, m_corners, m_uv, cam.fx, cam.fy, cam.cx, cam.cy
        )
        cm = jnp.sum(rm * rm, axis=-1)
        return jnp.sum(c * mask * inlier_w) + jnp.sum(cm * m_mask), c

    def round_body(rd, carry):
        Rcw, tcw, inlier_w = carry
        use_huber = rd < 2  # reference drops the robust kernel at round 3

        # LM with early exit: iterations are the dominant SEQUENTIAL cost of
        # the per-frame cascade (~50 us each on a v5e); LM is monotone
        # (steps are only accepted when chi2 drops), so stopping after two
        # consecutive stalled iterations returns the same pose the full
        # iteration budget would
        def lm_cond(state):
            _, _, _, _, it, stall = state
            return (it < iters_per_round) & (stall < 2)

        def lm_iter(state):
            Rcw, tcw, lam, chi2_cur, it, stall = state
            H, b, _ = build(Rcw, tcw, inlier_w, use_huber)
            dx = solve_damped(H, b, lam)
            dR, dt = se3_exp(dx)
            Rn, tn = se3_compose(dR, dt, Rcw, tcw)
            chi2_new, _ = total_chi2(Rn, tn, inlier_w)
            accept = chi2_new < chi2_cur
            improved = chi2_new < chi2_cur * (1.0 - 1e-5)
            Rcw = jnp.where(accept, Rn, Rcw)
            tcw = jnp.where(accept, tn, tcw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            lam = jnp.clip(lam, 1e-9, 1e6)
            chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
            stall = jnp.where(improved, 0, stall + 1)
            return Rcw, tcw, lam, chi2_cur, it + 1, stall

        chi2_0, _ = total_chi2(Rcw, tcw, inlier_w)
        Rcw, tcw, _, _, _, _ = jax.lax.while_loop(
            lm_cond, lm_iter,
            (Rcw, tcw, jnp.float32(lam0), chi2_0, jnp.int32(0), jnp.int32(0)),
        )
        # reclassify
        _, c = total_chi2(Rcw, tcw, jnp.ones_like(inlier_w))
        inlier_w = (c < chi2_th).astype(jnp.float32)
        return Rcw, tcw, inlier_w

    inlier_w = jnp.ones((n_pts,), dtype=jnp.float32)
    Rcw, tcw, inlier_w = jax.lax.fori_loop(
        0, rounds, round_body, (Rcw0, tcw0, inlier_w)
    )
    chi2_final, _ = total_chi2(Rcw, tcw, inlier_w)
    inl = (inlier_w > 0) & (mask > 0)
    # project the refined rotation back onto SO(3): the per-frame pose chain
    # (velocity seed -> optimize -> carry) amplifies float32 orthogonality
    # error ~2.4x per frame, which blows up det(R) within ~25 marker-free
    # frames. g2o gets this for free — every PoseOptimization roundtrips
    # through a unit-quaternion SE3Quat (se3quat.h); this is that
    # renormalization at the same once-per-optimization cadence.
    Rcw = orthonormalize(Rcw)
    return PoseOptResult(
        Rcw=Rcw,
        tcw=tcw,
        inliers=inl,
        n_inliers=jnp.sum(inl.astype(jnp.int32)),
        chi2=chi2_final,
    )
