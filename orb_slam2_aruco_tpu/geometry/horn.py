"""Horn's closed-form absolute orientation (Sim3 from 3D-3D correspondences).

Replaces Sim3Solver::ComputeSim3 (reference src/Sim3Solver.cc, Horn 1987
quaternion method). Batched over leading dims so the RANSAC loop becomes a
single vmapped evaluation of all hypothesis triples at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.lie import quat_to_rot


def horn_sim3(p1, p2, w=None, fix_scale: bool = False):
    """Find (s, R, t) minimizing sum_i w_i || p2_i - (s R p1_i + t) ||^2.

    Args:
      p1: [..., N, 3] source points
      p2: [..., N, 3] target points
      w:  optional [..., N] weights (>=0); also serves as the inlier mask
      fix_scale: if True, s = 1 (markers give metric scale — reference
        Sim3Solver bFixScale)

    Returns:
      (s [...], R [..., 3, 3], t [..., 3])
    """
    if w is None:
        w = jnp.ones(p1.shape[:-1], dtype=p1.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    wn = w / wsum
    c1 = jnp.sum(wn[..., None] * p1, axis=-2)
    c2 = jnp.sum(wn[..., None] * p2, axis=-2)
    q1 = p1 - c1[..., None, :]
    q2 = p2 - c2[..., None, :]
    # covariance M[i][j] = sum w * q1_i * q2_j (Horn's S matrix; this order
    # yields the quaternion rotating frame-1 vectors into frame 2)
    M = jnp.einsum("...n,...ni,...nj->...ij", wn, q1, q2)
    # Horn's 4x4 symmetric N matrix from M
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], axis=-1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], axis=-1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], axis=-1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], axis=-1),
        ],
        axis=-2,
    )
    # max eigenvector of N = rotation quaternion (w, x, y, z)
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, 3]  # eigh returns ascending eigenvalues
    R = quat_to_rot(q)
    # scale: s = sum w <q2, R q1> / sum w ||q1||^2 (asymmetric, matches the
    # reference's use where p1 lives in the frame whose scale is unknown)
    Rq1 = jnp.einsum("...ij,...nj->...ni", R, q1)
    num = jnp.sum(wn * jnp.sum(q2 * Rq1, axis=-1), axis=-1)
    den = jnp.maximum(jnp.sum(wn * jnp.sum(q1 * q1, axis=-1), axis=-1), 1e-12)
    s = num / den
    if fix_scale:
        s = jnp.ones_like(s)
    t = c2 - s[..., None] * jnp.einsum("...ij,...j->...i", R, c1)
    return s, R, t
