"""Relative Sim3 optimization between two keyframes (loop closing).

Replaces Optimizer::OptimizeSim3 (reference src/Optimizer.cc:1544-1739): one
Sim3 vertex with paired forward/inverse reprojection edges per point match;
5 LM iterations, prune chi2 > 10, then 10 more on survivors.

Jacobians come from vmapped forward-mode autodiff of the residual w.r.t. the
7-dim left-multiplicative Sim3 update — no hand-derived Sim3 chain rule.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import (
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
)
from orb_slam2_aruco_tpu.optim.lm import solve_damped
from orb_slam2_aruco_tpu.optim.residuals import huber_weight, project_pinhole


class Sim3Result(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def _residuals(xi, s0, R0, t0, p1, p2, uv1, uv2, cam: Camera):
    """Stacked residuals [N, 4]: forward (project S12 p2 into image 1) and
    inverse (project S12^-1 p1 into image 2)."""
    ds, dR, dt = sim3_exp(xi)
    s, R, t = sim3_compose(ds, dR, dt, s0, R0, t0)
    si, Ri, ti = sim3_inverse(s, R, t)
    q1 = sim3_apply(s[None], R, t, p2)        # p2 mapped into frame 1
    q2 = sim3_apply(si[None], Ri, ti, p1)     # p1 mapped into frame 2
    r1 = uv1 - project_pinhole(q1, cam.fx, cam.fy, cam.cx, cam.cy)
    r2 = uv2 - project_pinhole(q2, cam.fx, cam.fy, cam.cx, cam.cy)
    valid1 = q1[..., 2] > 0.02
    valid2 = q2[..., 2] > 0.02
    return jnp.concatenate([r1, r2], axis=-1), valid1 & valid2


def optimize_sim3(
    s0,
    R0,
    t0,
    p1,            # [N, 3] matched points in KF1 camera frame
    p2,            # [N, 3] matched points in KF2 camera frame
    uv1,           # [N, 2] observation of the match in image 1
    uv2,           # [N, 2] observation in image 2
    mask,          # [N]
    inv_sigma2_1,  # [N] per-observation info (octave) in image 1
    inv_sigma2_2,  # [N]
    cam: Camera,
    fix_scale: bool = False,
    chi2_th: float = 10.0,
    iters_first: int = 5,
    iters_second: int = 10,
    huber_delta: float = 3.1623,   # sqrt(10), reference deltaHuber
) -> Sim3Result:
    mask = mask.astype(jnp.float32)

    def edge_chi2(s, R, t):
        r, valid = _residuals(
            jnp.zeros(7, dtype=p1.dtype), s, R, t, p1, p2, uv1, uv2, cam
        )
        c1 = jnp.sum(r[..., :2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r[..., 2:] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2, valid

    def lm_phase(s, R, t, w_in, iters):
        def body(it, carry):
            s, R, t, lam, chi2_cur = carry
            zero = jnp.zeros(7, dtype=p1.dtype)
            r, valid = _residuals(zero, s, R, t, p1, p2, uv1, uv2, cam)
            J = jax.jacfwd(
                lambda xi: _residuals(xi, s, R, t, p1, p2, uv1, uv2, cam)[0]
            )(zero)  # [N, 4, 7]
            vw = w_in * mask * valid
            c1 = jnp.sum(r[..., :2] ** 2, axis=-1) * inv_sigma2_1
            c2 = jnp.sum(r[..., 2:] ** 2, axis=-1) * inv_sigma2_2
            w1 = vw * inv_sigma2_1 * huber_weight(c1, huber_delta)
            w2 = vw * inv_sigma2_2 * huber_weight(c2, huber_delta)
            wfull = jnp.concatenate(
                [w1[:, None].repeat(2, 1), w2[:, None].repeat(2, 1)], axis=1
            )  # [N, 4]
            H = jnp.einsum("nei,ne,nej->ij", J, wfull, J)
            b = -jnp.einsum("nei,ne,ne->i", J, wfull, r)
            if fix_scale:
                # zero out the sigma row/col; unit diagonal keeps it solvable
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                b = b.at[6].set(0.0)
            dx = solve_damped(H, b, lam)
            ds_, dR_, dt_ = sim3_exp(dx)
            sn, Rn, tn = sim3_compose(ds_, dR_, dt_, s, R, t)
            c1n, c2n, vn = edge_chi2(sn, Rn, tn)
            chi2_new = jnp.sum((c1n + c2n) * vw)
            accept = chi2_new < chi2_cur
            s = jnp.where(accept, sn, s)
            R = jnp.where(accept, Rn, R)
            t = jnp.where(accept, tn, t)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e6)
            chi2_cur = jnp.where(accept, chi2_new, chi2_cur)
            return s, R, t, lam, chi2_cur

        c1, c2, valid = edge_chi2(s, R, t)
        chi2_0 = jnp.sum((c1 + c2) * w_in * mask * valid)
        s, R, t, _, _ = jax.lax.fori_loop(
            0, iters, body, (s, R, t, jnp.float32(1e-3), chi2_0)
        )
        return s, R, t

    w = jnp.ones_like(mask)
    s, R, t = lm_phase(s0, R0, t0, w, iters_first)
    c1, c2, valid = edge_chi2(s, R, t)
    w = ((c1 < chi2_th) & (c2 < chi2_th) & valid).astype(jnp.float32)
    s, R, t = lm_phase(s, R, t, w, iters_second)
    c1, c2, valid = edge_chi2(s, R, t)
    inl = (c1 < chi2_th) & (c2 < chi2_th) & valid & (mask > 0)
    return Sim3Result(
        s=s, R=R, t=t, inliers=inl, n_inliers=jnp.sum(inl.astype(jnp.int32))
    )
