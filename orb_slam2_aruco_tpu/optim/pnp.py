"""Batched RANSAC PnP: camera pose from 2D-3D matches.

Replaces PnPsolver (reference src/PnPsolver.cc — EPnP + RANSAC, used only by
BoW relocalization, Tracking.cc:1788). TPU formulation: instead of an
iterative RANSAC loop with an intricate closed-form minimal solver, ALL
hypothesis subsets are solved simultaneously with the 6-point DLT (one
batched SVD), scored in one shot, and the best hypothesis is refined by the
standard pose LM. Same robustness contract (0.99/300 iterations/chi2 5.991),
one kernel launch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry import camera as cam_mod


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    inliers: jnp.ndarray   # [N]
    n_inliers: jnp.ndarray


def _dlt_pose(xyz, xn):
    """Projection-matrix DLT from >=6 correspondences (batched over leading
    dim). xyz [..., S, 3] world points; xn [..., S, 2] NORMALIZED image
    coords. Returns (R [..., 3, 3], t [..., 3])."""
    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    u, v = xn[..., 0], xn[..., 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -u * X, -u * Y, -u * Z, -u], axis=-1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -v * X, -v * Y, -v * Z, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)            # [..., 2S, 12]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[..., 11, :].reshape(vt.shape[:-2] + (3, 4))
    M = P[..., :3]
    # sign: points must be in front (positive depth for the majority)
    depth = (
        jnp.einsum("...j,...nj->...n", M[..., 2, :], xyz) + P[..., 2, 3][..., None]
    )
    sgn = jnp.where(jnp.median(depth, axis=-1) < 0, -1.0, 1.0)
    P = P * sgn[..., None, None]
    M = P[..., :3]
    # orthonormalize M -> R via SVD (nearest rotation), scale t accordingly
    um, sm, vmt = jnp.linalg.svd(M)
    R = um @ vmt
    detR = jnp.linalg.det(R)
    R = R * jnp.where(detR < 0, -1.0, 1.0)[..., None, None]
    scale = jnp.mean(sm, axis=-1)
    t = P[..., 3] / jnp.maximum(scale, 1e-12)[..., None]
    t = t * jnp.where(detR < 0, -1.0, 1.0)[..., None]
    return R, t


def _planar_pose(xyz, xn):
    """Homography-decomposition pose from >= 4 NEAR-COPLANAR world points
    (batched over leading dim). The projection-matrix DLT is DEGENERATE for
    coplanar points — and marker-wall scenes (the reference's own workload)
    are planar, so a pure-DLT RANSAC can never relocalize there. The
    reference's EPnP handles this with its planar 3-control-point case
    (PnPsolver.cc); here: fit the subset's plane (centroid + smallest
    eigenvector), express points in plane coordinates, estimate the
    plane->normalized-image homography by 2D DLT, and decompose
    H ~ [r1 r2 t] with SVD orthonormalization (Zhang)."""
    c = jnp.mean(xyz, axis=-2, keepdims=True)
    d = xyz - c                                       # [..., S, 3]
    cov = jnp.einsum("...si,...sj->...ij", d, d)
    evals, evecs = jnp.linalg.eigh(cov)               # ascending
    n = evecs[..., :, 0]                              # plane normal
    e1 = evecs[..., :, 2]
    e2 = evecs[..., :, 1]
    p2 = jnp.stack([
        jnp.einsum("...si,...i->...s", d, e1),
        jnp.einsum("...si,...i->...s", d, e2),
    ], axis=-1)                                       # [..., S, 2]
    # homography DLT: p2 -> xn
    X, Y = p2[..., 0], p2[..., 1]
    u, v = xn[..., 0], xn[..., 1]
    o = jnp.ones_like(X)
    z = jnp.zeros_like(X)
    r1 = jnp.stack([X, Y, o, z, z, z, -u * X, -u * Y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, X, Y, o, -v * X, -v * Y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)            # [..., 2S, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    H = vt[..., 8, :].reshape(vt.shape[:-2] + (3, 3))
    # scale so the rotation columns are unit-ish; enforce positive depth at
    # the plane origin (t_z > 0)
    lam = 0.5 * (
        jnp.linalg.norm(H[..., :, 0], axis=-1)
        + jnp.linalg.norm(H[..., :, 1], axis=-1)
    )
    H = H / jnp.maximum(lam, 1e-12)[..., None, None]
    H = H * jnp.where(H[..., 2, 2] < 0, -1.0, 1.0)[..., None, None]
    h1, h2, th = H[..., :, 0], H[..., :, 1], H[..., :, 2]
    h3 = jnp.cross(h1, h2)
    Q = jnp.stack([h1, h2, h3], axis=-1)              # [..., 3, 3]
    uq, _, vqt = jnp.linalg.svd(Q)
    Rh = uq @ vqt
    Rh = Rh * jnp.where(
        jnp.linalg.det(Rh) < 0, -1.0, 1.0
    )[..., None, None]
    # world pose: x_cam = Rh [p2; 0] + th with p2 = B^T (X - c):
    # R = Rh @ [e1 e2 n]^T, t = th - R c
    B = jnp.stack([e1, e2, n], axis=-1)               # [..., 3, 3]
    R = Rh @ jnp.swapaxes(B, -1, -2)
    t = th - jnp.einsum("...ij,...j->...i", R, c[..., 0, :])
    return R, t


def ransac_pnp(
    xyz,           # [N, 3] world points
    uv,            # [N, 2] observed (undistorted) pixels
    mask,          # [N] validity
    cam: Camera,
    num_hypotheses: int = 256,
    subset: int = 6,
    chi2_th: float = 5.991,
    min_inliers: int = 10,
    seed: int = 0,
) -> PnPResult:
    N = xyz.shape[0]
    xn = cam_mod.pixels_to_normalized(cam, uv)
    key = jax.random.PRNGKey(seed)
    w = mask.astype(jnp.float32)
    p = w / jnp.maximum(jnp.sum(w), 1.0)
    sets = jax.random.choice(
        key, N, shape=(num_hypotheses, subset), replace=True, p=p
    )
    # both minimal solvers per hypothesis: the projection DLT (general
    # scenes) and the homography decomposition (planar scenes, where the
    # DLT is degenerate); all hypotheses scored in one shot
    R_d, t_d = _dlt_pose(xyz[sets], xn[sets])         # [H, 3, 3], [H, 3]
    R_p, t_p = _planar_pose(xyz[sets], xn[sets])
    R = jnp.concatenate([R_d, R_p])
    t = jnp.concatenate([t_d, t_p])
    # score all hypotheses against all points
    p_cam = jnp.einsum("hij,nj->hni", R, xyz) + t[:, None]
    uv_pred = cam_mod.project(cam, p_cam)
    err2 = jnp.sum((uv_pred - uv[None]) ** 2, axis=-1)
    ok_pt = (err2 < chi2_th) & (p_cam[..., 2] > 0.02) & (mask[None] > 0)
    scores = jnp.sum(ok_pt.astype(jnp.int32), axis=-1)
    best = jnp.argmax(scores)
    inl = ok_pt[best]
    return PnPResult(
        ok=scores[best] >= min_inliers,
        Rcw=R[best],
        tcw=t[best],
        inliers=inl,
        n_inliers=scores[best],
    )
