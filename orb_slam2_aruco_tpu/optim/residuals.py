"""Reprojection residuals + analytic Jacobians for the SLAM edge types.

Replaces g2o's edge types:
  * EdgeSE3ProjectXYZOnlyPose  (Thirdparty/g2o types_six_dof_expmap.h:104-196)
  * EdgeSE3ProjectXYZ
  * EdgeMarker                 (reference g2oAddition/EdgeMarker.h:41-54 —
    camera Tcw x marker Twm binary edge, one per marker corner, info 25*I2)

Pose parameterization: Tcw = exp(xi) * Tcw0 (left-multiplicative update with
(upsilon, omega) ordering), matching g2o's SE3Quat::exp update so the
reference's convergence behavior carries over.

All functions are batched over an edge axis; masks make padded edges free.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.lie import hat


def project_pinhole(p_cam, fx, fy, cx, cy):
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-9, 1e-9, p_cam[..., 2])
    u = fx * p_cam[..., 0] / z + cx
    v = fy * p_cam[..., 1] / z + cy
    return jnp.stack([u, v], axis=-1)


def reproj_residual(Rcw, tcw, xyz_w, uv_obs, fx, fy, cx, cy):
    """r = obs - proj(Tcw * X). [..., 2]."""
    p = jnp.einsum("...ij,...j->...i", Rcw, xyz_w) + tcw
    return uv_obs - project_pinhole(p, fx, fy, cx, cy), p


def dproj_dpcam(p_cam, fx, fy, cx, cy):
    """Jacobian of projection w.r.t. camera-frame point: [..., 2, 3]."""
    x, y = p_cam[..., 0], p_cam[..., 1]
    z = jnp.where(jnp.abs(p_cam[..., 2]) < 1e-9, 1e-9, p_cam[..., 2])
    iz = 1.0 / z
    iz2 = iz * iz
    zr = jnp.zeros_like(x)
    row0 = jnp.stack([fx * iz, zr, -fx * x * iz2], axis=-1)
    row1 = jnp.stack([zr, fy * iz, -fy * y * iz2], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def jac_pose(p_cam, fx, fy, cx, cy):
    """d residual / d xi for left-mult pose update, xi = (upsilon, omega).

    d(exp(xi) p)/dxi at 0 = [I | -hat(p)]; residual = obs - proj, so J gets a
    minus sign. Returns [..., 2, 6]."""
    A = dproj_dpcam(p_cam, fx, fy, cx, cy)  # [..., 2, 3]
    Jp = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), p_cam.shape[:-1] + (3, 3)),
        -hat(p_cam),
    ], axis=-1)  # [..., 3, 6]
    return -(A @ Jp)


def jac_point(p_cam, Rcw, fx, fy, cx, cy):
    """d residual / d xyz_world: [..., 2, 3]."""
    A = dproj_dpcam(p_cam, fx, fy, cx, cy)
    return -(A @ Rcw)


def marker_corner_points_world(Rwm, twm, side):
    """4 marker corners in world frame. Corner order per reference
    MapAruco.cc:30-37. Rwm [..., 3, 3], twm [..., 3], side scalar or [...]."""
    h = side / 2.0
    if not hasattr(h, "ndim") or h.ndim == 0:
        h = jnp.broadcast_to(jnp.asarray(h, dtype=twm.dtype), twm.shape[:-1])
    local = jnp.stack(
        [
            jnp.stack([-h, h, jnp.zeros_like(h)], axis=-1),
            jnp.stack([h, h, jnp.zeros_like(h)], axis=-1),
            jnp.stack([h, -h, jnp.zeros_like(h)], axis=-1),
            jnp.stack([-h, -h, jnp.zeros_like(h)], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 3]
    return jnp.einsum("...ij,...nj->...ni", Rwm, local) + twm[..., None, :]


def jac_marker_world(p_cam, Rcw, corner_world, fx, fy, cx, cy):
    """d residual / d xi_marker (left-mult update of Twm). corner_world is the
    corner position in world frame (= Twm @ corner_local). [..., 2, 6]."""
    A = dproj_dpcam(p_cam, fx, fy, cx, cy)
    Jq = jnp.concatenate([
        jnp.broadcast_to(jnp.eye(3, dtype=p_cam.dtype), p_cam.shape[:-1] + (3, 3)),
        -hat(corner_world),
    ], axis=-1)  # [..., 3, 6]
    return -(A @ (Rcw @ Jq))


def huber_weight(r2, delta):
    """IRLS weight for the Huber kernel: w = 1 if |r| <= delta else delta/|r|.
    r2 = squared residual norm."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    return jnp.where(r <= delta, jnp.ones_like(r), delta / r)
