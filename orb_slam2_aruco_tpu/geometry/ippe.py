"""IPPE: Infinitesimal Plane-based Pose Estimation (Collins & Bartoli, IJCV'14).

Closed-form planar pose with BOTH ambiguity solutions and their reprojection
residuals — replaces aruco::solvePnP (reference Thirdparty/aruco/ippe.h:14-22);
the err0/err1 < 0.7 ambiguity gate of the reference (src/Frame.cc:170-174)
consumes the returned residuals.

Everything is batched over leading dims: all marker candidates in a frame are
solved in one shot.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.lie import hat


class IppeResult(NamedTuple):
    R: jnp.ndarray        # [..., 2, 3, 3] two rotation solutions (best first)
    t: jnp.ndarray        # [..., 2, 3]
    err: jnp.ndarray      # [..., 2] mean squared reprojection error (normalized coords)
    ratio: jnp.ndarray    # [...] err0 / err1 (ambiguity measure, <= 1)


def square_object_points(side, dtype=jnp.float32):
    """Canonical marker corners on z=0, same winding as the reference
    (MapAruco.cc:30-37): c0=(-s/2,+s/2), c1=(+s/2,+s/2), c2=(+s/2,-s/2),
    c3=(-s/2,-s/2)."""
    h = side / 2.0
    return jnp.asarray(
        [[-h, h, 0.0], [h, h, 0.0], [h, -h, 0.0], [-h, -h, 0.0]], dtype=dtype
    )


def homography_4pt(src, dst):
    """Exact homography from 4 correspondences via an 8x8 linear solve.

    src, dst: [..., 4, 2]. Returns H [..., 3, 3] with H[2,2] = 1, mapping
    src -> dst (homogeneous)."""
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    # rows: [x y 1 0 0 0 -ux -uy] h = u ; [0 0 0 x y 1 -vx -vy] h = v
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y], axis=-1)  # [..., 4, 8]
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 8, 8]
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # [..., 8, 1]
    h = jnp.linalg.solve(A, b)[..., 0]
    o1 = jnp.ones(h.shape[:-1] + (1,), dtype=h.dtype)
    H = jnp.concatenate([h, o1], axis=-1).reshape(h.shape[:-1] + (3, 3))
    return H


def _rotate_vec_to_z(v):
    """Rotation Rv with Rv @ (v/||v||) = e_z. v: [..., 3]."""
    a = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    ez = jnp.zeros_like(a).at[..., 2].set(1.0)
    k = jnp.cross(a, ez)
    s = jnp.linalg.norm(k, axis=-1)
    c = a[..., 2]
    small = s < 1e-9
    k_unit = k / jnp.where(small, 1.0, s)[..., None]
    K = hat(k_unit)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    theta = jnp.arctan2(s, c)
    R = (
        eye
        + jnp.sin(theta)[..., None, None] * K
        + (1.0 - jnp.cos(theta))[..., None, None] * (K @ K)
    )
    # v parallel to +z -> identity; antiparallel -> 180deg about x
    flip = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]], dtype=v.dtype), K.shape
    )
    R_small = jnp.where(c[..., None, None] > 0, eye, flip)
    return jnp.where(small[..., None, None], R_small, R)


def _translation_lsq(R, xyz_obj, xn):
    """Least-squares translation given rotation: min_t sum ||pi(R X + t) - xn||^2
    (algebraic form). R [..., 3, 3]; xyz_obj [..., N, 3]; xn [..., N, 2]."""
    a = jnp.einsum("...ij,...nj->...ni", R, xyz_obj)  # [..., N, 3]
    u, v = xn[..., 0], xn[..., 1]
    # rows: (1, 0, -u) t = u a3 - a1 ; (0, 1, -v) t = v a3 - a2
    o = jnp.ones_like(u)
    z = jnp.zeros_like(u)
    A1 = jnp.stack([o, z, -u], axis=-1)
    A2 = jnp.stack([z, o, -v], axis=-1)
    A = jnp.concatenate([A1, A2], axis=-2)  # [..., 2N, 3]
    b1 = u * a[..., 2] - a[..., 0]
    b2 = v * a[..., 2] - a[..., 1]
    b = jnp.concatenate([b1, b2], axis=-1)[..., None]  # [..., 2N, 1]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    Atb = jnp.swapaxes(A, -1, -2) @ b
    t = jnp.linalg.solve(AtA, Atb)[..., 0]
    return t


def _reproj_err(R, t, xyz_obj, xn):
    p = jnp.einsum("...ij,...nj->...ni", R, xyz_obj) + t[..., None, :]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-9, 1e-9, p[..., 2])
    proj = p[..., :2] / z[..., None]
    return jnp.mean(jnp.sum((proj - xn) ** 2, axis=-1), axis=-1)


def ippe_planar_pose(xyz_obj, xn) -> IppeResult:
    """Both planar-pose solutions for coplanar (z=0, centered) object points.

    Args:
      xyz_obj: [..., N, 3] object points on the z=0 plane, centroid at origin
      xn: [..., N, 2] observed NORMALIZED image coordinates

    Returns IppeResult with solutions sorted by reprojection error.
    """
    H = homography_4pt(xyz_obj[..., :4, :2], xn[..., :4, :])
    p = H[..., 0, 2]
    q = H[..., 1, 2]
    # Jacobian of the homography-induced map at the object origin
    j00 = H[..., 0, 0] - p * H[..., 2, 0]
    j01 = H[..., 0, 1] - p * H[..., 2, 1]
    j10 = H[..., 1, 0] - q * H[..., 2, 0]
    j11 = H[..., 1, 1] - q * H[..., 2, 1]
    v = jnp.stack([p, q, jnp.ones_like(p)], axis=-1)
    Rv = _rotate_vec_to_z(v)
    # In the Rv-rotated camera the plane origin projects to (0,0), and the
    # rotated Jacobian C = Rv[0:2,0:2] @ J equals gamma * (Rv R)[0:2,0:2]
    # exactly (chain rule through the rotation homography, whose own Jacobian
    # at (p,q) is Rv[0:2,0:2]/||v||; the scalar folds into gamma).
    b00 = Rv[..., 0, 0] * j00 + Rv[..., 0, 1] * j10
    b01 = Rv[..., 0, 0] * j01 + Rv[..., 0, 1] * j11
    b10 = Rv[..., 1, 0] * j00 + Rv[..., 1, 1] * j10
    b11 = Rv[..., 1, 0] * j01 + Rv[..., 1, 1] * j11
    dtB = b00 * b11 - b01 * b10
    bsq = b00 * b00 + b01 * b01 + b10 * b10 + b11 * b11
    inner = jnp.maximum(bsq * bsq - 4.0 * dtB * dtB, 0.0)
    gamma = jnp.sqrt(jnp.maximum(0.5 * (bsq + jnp.sqrt(inner)), 1e-12))
    rt00 = b00 / gamma
    rt01 = b01 / gamma
    rt10 = b10 / gamma
    rt11 = b11 / gamma
    c0 = jnp.sqrt(jnp.maximum(1.0 - rt00 * rt00 - rt10 * rt10, 0.0))
    c1mag = jnp.sqrt(jnp.maximum(1.0 - rt01 * rt01 - rt11 * rt11, 0.0))
    sp = -(rt00 * rt01 + rt10 * rt11)
    c1 = jnp.where(sp < 0, -c1mag, c1mag)

    def build_R(s):
        col0 = jnp.stack([rt00, rt10, s * c0], axis=-1)
        col1 = jnp.stack([rt01, rt11, s * c1], axis=-1)
        col2 = jnp.cross(col0, col1)
        M = jnp.stack([col0, col1, col2], axis=-1)  # columns
        # full rotation: undo the Rv frame change
        return jnp.swapaxes(Rv, -1, -2) @ M

    R1 = build_R(1.0)
    R2 = build_R(-1.0)
    t1 = _translation_lsq(R1, xyz_obj, xn)
    t2 = _translation_lsq(R2, xyz_obj, xn)
    e1 = _reproj_err(R1, t1, xyz_obj, xn)
    e2 = _reproj_err(R2, t2, xyz_obj, xn)
    # degenerate inputs (zero-area quads, singular homographies) yield NaNs:
    # sanitize to identity pose with infinite error so callers can mask on err
    def _san(R, t, e):
        ok = (
            jnp.all(jnp.isfinite(R), axis=(-1, -2))
            & jnp.all(jnp.isfinite(t), axis=-1)
            & jnp.isfinite(e)
        )
        eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
        R = jnp.where(ok[..., None, None], R, eye)
        t = jnp.where(ok[..., None], t, jnp.zeros_like(t))
        e = jnp.where(ok, e, jnp.full_like(e, 1e12))
        return R, t, e

    R1, t1, e1 = _san(R1, t1, e1)
    R2, t2, e2 = _san(R2, t2, e2)
    swap = e2 < e1
    Ra = jnp.where(swap[..., None, None], R2, R1)
    Rb = jnp.where(swap[..., None, None], R1, R2)
    ta = jnp.where(swap[..., None], t2, t1)
    tb = jnp.where(swap[..., None], t1, t2)
    ea = jnp.where(swap, e2, e1)
    eb = jnp.where(swap, e1, e2)
    ratio = ea / jnp.maximum(eb, 1e-12)
    return IppeResult(
        R=jnp.stack([Ra, Rb], axis=-3),
        t=jnp.stack([ta, tb], axis=-2),
        err=jnp.stack([ea, eb], axis=-1),
        ratio=ratio,
    )


def ippe_square(side, xn) -> IppeResult:
    """Convenience: IPPE for a canonical square marker of given side length.
    xn: [..., 4, 2] normalized image coords in reference corner order."""
    obj = square_object_points(side, dtype=xn.dtype)
    obj = jnp.broadcast_to(obj, xn.shape[:-2] + (4, 3))
    return ippe_planar_pose(obj, xn)
