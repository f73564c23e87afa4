"""Two-view relative geometry: batched H / F estimation, scoring, and
decomposition. Replaces the classic monocular bootstrap of
Initializer::{FindHomography,FindFundamental,ReconstructF,ReconstructH,CheckRT}
(reference src/Initializer.cc). The reference races two std::threads over 200
RANSAC sets each; here every hypothesis set is solved and scored in one batched
evaluation — RANSAC becomes an argmax.
"""

from __future__ import annotations

import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.triangulate import triangulate_dlt, parallax_cos


def normalize_points(x, mask=None):
    """Hartley normalization. x: [..., N, 2] -> (xn, T [3x3]) with mean 0 and
    mean abs deviation 1 (matching the reference's Normalize)."""
    if mask is None:
        mask = jnp.ones(x.shape[:-1], dtype=x.dtype)
    m = mask[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / cnt
    d = jnp.sum(jnp.abs(x - mean) * m, axis=-2, keepdims=True) / cnt
    s = 1.0 / jnp.maximum(d, 1e-9)
    xn = (x - mean) * s
    sx = s[..., 0, 0]
    sy = s[..., 0, 1]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    T = jnp.stack(
        [
            jnp.stack([sx, z, -mx * sx], axis=-1),
            jnp.stack([z, sy, -my * sy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def fundamental_8pt(x1, x2):
    """Normalized 8-point algorithm. x1, x2: [..., M>=8, 2] -> F [..., 3, 3]
    with rank-2 enforcement."""
    x1n, T1 = normalize_points(x1)
    x2n, T2 = normalize_points(x2)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    o = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1
    )  # [..., M, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    f = vt[..., 8, :].reshape(vt.shape[:-2] + (3, 3))
    # rank-2
    uf, sf, vtf = jnp.linalg.svd(f)
    sf = sf.at[..., 2].set(0.0)
    f2 = uf @ (sf[..., None] * vtf)
    F = jnp.swapaxes(T2, -1, -2) @ f2 @ T1
    return F


def homography_dlt(x1, x2):
    """DLT homography from >=4 points. x1, x2: [..., M, 2] -> H [..., 3, 3]
    (maps x1 -> x2)."""
    x1n, T1 = normalize_points(x1)
    x2n, T2 = normalize_points(x2)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2M, 9]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    h = vt[..., 8, :].reshape(vt.shape[:-2] + (3, 3))
    Hn = jnp.linalg.solve(T2, h) @ T1  # T2^-1 h T1
    return Hn / jnp.where(jnp.abs(Hn[..., 2:3, 2:3]) < 1e-12, 1e-12, Hn[..., 2:3, 2:3])


def _apply_h(H, x):
    xh = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    y = jnp.einsum("...ij,...nj->...ni", H, xh)
    w = jnp.where(jnp.abs(y[..., 2]) < 1e-12, 1e-12, y[..., 2])
    return y[..., :2] / w[..., None]


def score_homography(H, x1, x2, mask, sigma: float = 1.0, th: float = 5.991):
    """Symmetric transfer error robust score (reference CheckHomography).
    Returns (score, inlier_mask)."""
    Hinv = jnp.linalg.inv(H)
    inv_sigma2 = 1.0 / (sigma * sigma)
    d12 = jnp.sum((_apply_h(H, x1) - x2) ** 2, axis=-1) * inv_sigma2
    d21 = jnp.sum((_apply_h(Hinv, x2) - x1) ** 2, axis=-1) * inv_sigma2
    in12 = d12 < th
    in21 = d21 < th
    sc = jnp.where(in12, th - d12, 0.0) + jnp.where(in21, th - d21, 0.0)
    inl = in12 & in21 & (mask > 0)
    return jnp.sum(sc * mask, axis=-1), inl


def score_fundamental(F, x1, x2, mask, sigma: float = 1.0):
    """Point-to-epiline chi2 score (reference CheckFundamental): per-direction
    1-dof gate 3.841, score accumulated against 5.991."""
    th = 3.841
    th_score = 5.991
    inv_sigma2 = 1.0 / (sigma * sigma)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    l2 = jnp.einsum("...ij,...nj->...ni", F, x1h)  # line in image 2
    l1 = jnp.einsum("...ji,...nj->...ni", F, x2h)  # line in image 1
    d2 = (jnp.sum(l2 * x2h, axis=-1) ** 2) / jnp.maximum(
        l2[..., 0] ** 2 + l2[..., 1] ** 2, 1e-12
    )
    d1 = (jnp.sum(l1 * x1h, axis=-1) ** 2) / jnp.maximum(
        l1[..., 0] ** 2 + l1[..., 1] ** 2, 1e-12
    )
    c2 = d2 * inv_sigma2
    c1 = d1 * inv_sigma2
    sc = jnp.where(c2 < th, th_score - c2, 0.0) + jnp.where(c1 < th, th_score - c1, 0.0)
    inl = (c1 < th) & (c2 < th) & (mask > 0)
    return jnp.sum(sc * mask, axis=-1), inl


def essential_from_fundamental(F, K):
    return jnp.swapaxes(K, -1, -2) @ F @ K


def decompose_E(E):
    """E -> 4 candidate (R, t): [(R1,t),(R1,-t),(R2,t),(R2,-t)].
    Returns R [..., 4, 3, 3], t [..., 4, 3] (unit norm)."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce det(U)>0, det(V)>0
    du = jnp.linalg.det(u)
    dv = jnp.linalg.det(vt)
    u = u * jnp.where(du < 0, -1.0, 1.0)[..., None, None]
    vt = vt * jnp.where(dv < 0, -1.0, 1.0)[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = u @ W @ vt
    R2 = u @ jnp.swapaxes(W, -1, -2) @ vt
    t = u[..., :, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
    R = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return R, ts


def decompose_H(H, K):
    """Faugeras-Lustman decomposition of a Euclidean homography into 8
    candidate (R, t, n) (reference ReconstructH; Faugeras & Lustman 1988).
    Returns R [..., 8, 3, 3], t [..., 8, 3] (unit-ish scale)."""
    A = jnp.linalg.solve(K, H) @ K  # K^-1 H K
    u, s, vt = jnp.linalg.svd(A)
    d1, d2, d3 = s[..., 0], s[..., 1], s[..., 2]
    detU = jnp.linalg.det(u)
    detV = jnp.linalg.det(vt)  # det(V^T) = det(V)
    sgn = detU * detV
    V = jnp.swapaxes(vt, -1, -2)

    d1s = jnp.where(jnp.abs(d1 - d3) < 1e-12, d1 + 1e-6, d1)
    x1 = jnp.sqrt(jnp.maximum((d1s * d1s - d2 * d2) / (d1s * d1s - d3 * d3), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / (d1s * d1s - d3 * d3), 0.0))

    outs_R = []
    outs_t = []
    e1l = jnp.asarray([1.0, -1.0, 1.0, -1.0])
    e3l = jnp.asarray([1.0, 1.0, -1.0, -1.0])
    # case d' = +d2
    sin_t = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 + d3) * d2, 1e-12)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    for i in range(4):
        e1, e3 = e1l[i], e3l[i]
        st = e1 * e3 * sin_t
        Rp = jnp.zeros(H.shape[:-2] + (3, 3), dtype=H.dtype)
        Rp = Rp.at[..., 0, 0].set(cos_t)
        Rp = Rp.at[..., 0, 2].set(-st)
        Rp = Rp.at[..., 1, 1].set(1.0)
        Rp = Rp.at[..., 2, 0].set(st)
        Rp = Rp.at[..., 2, 2].set(cos_t)
        tp = jnp.stack(
            [e1 * x1, jnp.zeros_like(x1), -e3 * x3], axis=-1
        ) * (d1 - d3)[..., None]
        R = sgn[..., None, None] * (u @ Rp @ vt)
        t = jnp.einsum("...ij,...j->...i", u, tp)
        outs_R.append(R)
        outs_t.append(t)
    # case d' = -d2
    sin_p = jnp.sqrt(
        jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)
    ) / jnp.maximum((d1 - d3) * d2, 1e-12)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    for i in range(4):
        e1, e3 = e1l[i], e3l[i]
        sp = e1 * e3 * sin_p
        Rp = jnp.zeros(H.shape[:-2] + (3, 3), dtype=H.dtype)
        Rp = Rp.at[..., 0, 0].set(cos_p)
        Rp = Rp.at[..., 0, 2].set(sp)
        Rp = Rp.at[..., 1, 1].set(-1.0)
        Rp = Rp.at[..., 2, 0].set(sp)
        Rp = Rp.at[..., 2, 2].set(-cos_p)
        tp = jnp.stack(
            [e1 * x1, jnp.zeros_like(x1), e3 * x3], axis=-1
        ) * (d1 + d3)[..., None]
        R = sgn[..., None, None] * (u @ Rp @ vt)
        t = jnp.einsum("...ij,...j->...i", u, tp)
        outs_R.append(R)
        outs_t.append(t)
    Rs = jnp.stack(outs_R, axis=-3)
    ts = jnp.stack(outs_t, axis=-2)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    del V
    return Rs, ts


def check_rt(R, t, xn1, xn2, mask, reproj_th: float = 4.0 / 500.0**2,
             min_parallax_cos: float = 0.99998):
    """Count triangulated matches passing cheirality + reprojection + parallax
    (reference CheckRT, Initializer.cc:865). Works in NORMALIZED coords.

    Args:
      R, t: candidate pose of cam2 w.r.t. cam1 (x2 = R x1 + t), [..., 3, 3]/[..., 3]
      xn1, xn2: [..., N, 2] normalized coords
      mask: [..., N] match validity
      reproj_th: squared error threshold in normalized units
    Returns (n_good [...], good_mask [..., N], xyz [..., N, 3], parallax_ok)."""
    batch = R.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), batch + (3, 3))
    zero = jnp.zeros(batch + (3,), dtype=R.dtype)
    Rb = jnp.broadcast_to(R[..., None, :, :], batch + (xn1.shape[-2], 3, 3))
    tb = jnp.broadcast_to(t[..., None, :], batch + (xn1.shape[-2], 3))
    eyeb = jnp.broadcast_to(eye[..., None, :, :], Rb.shape)
    zerob = jnp.zeros_like(tb)
    xyz = triangulate_dlt(eyeb, zerob, Rb, tb, xn1, xn2)
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    z1 = xyz[..., 2]
    p2 = jnp.einsum("...nij,...nj->...ni", Rb, xyz) + tb
    z2 = p2[..., 2]
    pr1 = xyz[..., :2] / jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)[..., None]
    pr2 = p2[..., :2] / jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)[..., None]
    e1 = jnp.sum((pr1 - xn1) ** 2, axis=-1)
    e2 = jnp.sum((pr2 - xn2) ** 2, axis=-1)
    c1 = zero
    c2 = -jnp.einsum("...ji,...j->...i", R, t)  # cam2 center in cam1 frame
    pcos = parallax_cos(c1[..., None, :], c2[..., None, :], xyz)
    good = (
        finite
        & (z1 > 0)
        & (z2 > 0)
        & (e1 < reproj_th)
        & (e2 < reproj_th)
        & (mask > 0)
    )
    has_parallax = pcos < min_parallax_cos
    n_good = jnp.sum(good & has_parallax, axis=-1)
    return n_good, good, xyz, pcos
