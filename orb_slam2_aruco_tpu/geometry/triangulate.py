"""Batched two-view DLT triangulation (replaces Initializer::Triangulate,
reference src/Initializer.cc:801-820, and the SVD triangulation inside
LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:222-467)."""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_dlt(R1, t1, R2, t2, xn1, xn2):
    """Triangulate in world frame from two camera poses (world->cam) and
    normalized image coords.

    Args:
      R1, t1: pose of cam1 (x_cam = R1 x_world + t1), [..., 3, 3], [..., 3]
      R2, t2: pose of cam2
      xn1, xn2: normalized coords [..., 2]

    Returns:
      xyz_world [..., 3]
    """
    P1 = jnp.concatenate([R1, t1[..., None]], axis=-1)  # [..., 3, 4]
    P2 = jnp.concatenate([R2, t2[..., None]], axis=-1)
    rows = [
        xn1[..., 0:1, None] * P1[..., 2:3, :] - P1[..., 0:1, :],
        xn1[..., 1:2, None] * P1[..., 2:3, :] - P1[..., 1:2, :],
        xn2[..., 0:1, None] * P2[..., 2:3, :] - P2[..., 0:1, :],
        xn2[..., 1:2, None] * P2[..., 2:3, :] - P2[..., 1:2, :],
    ]
    A = jnp.concatenate(rows, axis=-2)  # [..., 4, 4]
    # Inhomogeneous DLT: fix the homogeneous scale w = 1 and least-squares
    # solve A[:, :3] x = -A[:, 3] via 3x3 normal equations with a closed-form
    # adjugate inverse. Batched jnp.linalg.svd of the 4x4s (the homogeneous
    # null-space route, what the reference's cv::SVD does in
    # Initializer::Triangulate, Initializer.cc:801) runs an ITERATIVE Jacobi
    # sweep on TPU — ~100 ms for the 24k little SVDs of one keyframe insert.
    # The only cases where the two differ are points at/near infinity
    # (w -> 0), which every call site rejects anyway (cheirality z > 0,
    # reprojection-error and parallax gates).
    A3 = A[..., :, :3]
    b = -A[..., :, 3]
    M = jnp.einsum("...ki,...kj->...ij", A3, A3)        # [..., 3, 3] SPD
    v = jnp.einsum("...ki,...k->...i", A3, b)
    # regularize relative to scale so exactly-degenerate rows give finite
    # garbage (killed by the callers' gates) instead of inf/nan exceptions
    tr = M[..., 0, 0] + M[..., 1, 1] + M[..., 2, 2]
    M = M + (1e-12 * tr + 1e-30)[..., None, None] * jnp.eye(3, dtype=M.dtype)
    # adjugate inverse (batched closed form; no LU/SVD loops)
    c00 = M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1]
    c01 = M[..., 0, 2] * M[..., 2, 1] - M[..., 0, 1] * M[..., 2, 2]
    c02 = M[..., 0, 1] * M[..., 1, 2] - M[..., 0, 2] * M[..., 1, 1]
    c10 = M[..., 1, 2] * M[..., 2, 0] - M[..., 1, 0] * M[..., 2, 2]
    c11 = M[..., 0, 0] * M[..., 2, 2] - M[..., 0, 2] * M[..., 2, 0]
    c12 = M[..., 0, 2] * M[..., 1, 0] - M[..., 0, 0] * M[..., 1, 2]
    c20 = M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]
    c21 = M[..., 0, 1] * M[..., 2, 0] - M[..., 0, 0] * M[..., 2, 1]
    c22 = M[..., 0, 0] * M[..., 1, 1] - M[..., 0, 1] * M[..., 1, 0]
    det = (M[..., 0, 0] * c00 + M[..., 0, 1] * c10 + M[..., 0, 2] * c20)
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c10, c11, c12], axis=-1),
        jnp.stack([c20, c21, c22], axis=-1),
    ], axis=-2)
    return jnp.einsum(
        "...ij,...j->...i", adj, v
    ) / det_safe[..., None]


def depth_in_cam(R, t, xyz_world):
    """z-coordinate of world points in a camera (cheirality test input)."""
    return (
        jnp.einsum("...j,...j->...", R[..., 2, :], xyz_world) + t[..., 2]
    )


def parallax_cos(c1, c2, xyz):
    """Cosine of the ray angle between camera centers c1, c2 and point xyz."""
    r1 = xyz - c1
    r2 = xyz - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    denom = jnp.maximum(n1 * n2, 1e-12)
    return jnp.sum(r1 * r2, axis=-1) / denom
