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
    # null vector of A = eigenvector of A^T A with min eigenvalue.
    # Use SVD for robustness (batched, small fixed 4x4 — fine on TPU).
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., 3, :]
    w = X[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe[..., None]


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
