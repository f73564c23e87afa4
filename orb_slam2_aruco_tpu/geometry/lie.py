"""SO3 / SE3 / Sim3 Lie-group operations, batched over leading dims.

Replaces g2o's SE3Quat (Thirdparty/g2o/g2o/types/se3quat.h) and Sim3
(sim3.h) with pure-JAX functional equivalents. Rotations are 3x3 matrices
(TPU-friendly: small fixed matmuls fuse well); poses are (R, t) tuples;
Sim3 is (s, R, t).

All functions accept arbitrary leading batch dimensions and are safe under
jit/vmap/grad. Taylor fallbacks near theta=0 keep gradients finite.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so3 hat: [..., 3] -> [..., 3, 3] skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Rodrigues: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    # guard BEFORE sqrt: d(sqrt)/dx at 0 is inf, and a `where` does not stop
    # NaN gradients from the untaken branch
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallback
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R):
    """[..., 3, 3] -> [..., 3]. Stable near 0 and pi — including under
    AUTODIFF at exactly R = I: the angle comes from atan2(|sin|, cos)
    (finite derivative at identity, unlike arccos whose slope is infinite
    at cos = 1) and every division is double-where guarded so jacfwd/jacrev
    never see 0/0. Pose-graph edges measured from the very poses being
    optimized have EXACTLY zero residual, and a NaN Jacobian there silently
    zeroed the whole essential-graph update (optim/pose_graph.py guards
    dx with isfinite)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_vee = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    nq = jnp.sum(w_vee * w_vee, axis=-1)            # = sin(theta)^2
    small = nq < 1e-12                              # theta < ~1e-6 (or ~pi)
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, nq))
    theta = jnp.arctan2(
        jnp.where(small, 0.0, sin_theta), cos_theta
    )
    near_pi = (cos_theta < -0.98)                   # theta > ~2.94
    # generic: theta / sin(theta) * w_vee; small: theta ~ sin -> scale ~ 1
    scale = jnp.where(
        small,
        1.0 + nq / 6.0,
        theta / jnp.where(small, 1.0, sin_theta),
    )
    w_generic = scale[..., None] * w_vee
    # near pi: axis from the symmetric part. S = (R+R^T)/2 = I + (1-cos t) K^2
    # and aa^T = I + K^2, so A = I + (S - I)/(1-cos t) = aa^T exactly — the
    # noisy sin(t) K term cancels. Take the largest-pivot row of A.
    one_minus_cos = jnp.maximum(1.0 - cos_theta, 0.5)  # only used when t > 3
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    A = eye3 + (S - eye3) / one_minus_cos[..., None, None]
    diag = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    row = jnp.take_along_axis(
        A, k[..., None, None] * jnp.ones_like(A[..., :1, :], dtype=k.dtype), axis=-2
    )[..., 0, :]
    axis = row / jnp.maximum(jnp.linalg.norm(row, axis=-1, keepdims=True), _EPS)
    # fix the sign from w_vee = sin(theta)*axis (away from exactly pi the sign
    # is meaningful; at exactly pi both signs are valid logs)
    sgn = jnp.where(jnp.sum(axis * w_vee, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = sgn * axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def _so3_left_jacobian(w):
    """V matrix of SE3 exp: [..., 3] -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2_safe * theta),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    half = theta * 0.5
    sin_half = jnp.sin(half)
    sin_half_safe = jnp.where(jnp.abs(sin_half) < 1e-12, 1.0, sin_half)
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / sin_half_safe) / theta2_safe,
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * (W @ W)


def se3_exp(xi):
    """se3 exp. xi = [..., 6] with (upsilon, omega) ordering (translation first,
    matching g2o SE3Quat::exp). Returns (R [...,3,3], t [...,3])."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R, t):
    """Inverse of se3_exp -> [..., 6] (upsilon, omega)."""
    w = so3_log(R)
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): x -> Ra(Rb x + tb) + ta."""
    R = Ra @ Rb
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return R, t


def se3_inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    return Rinv, tinv


def se3_apply(R, t, x):
    """Apply pose to points: [..., 3, 3], [..., 3], [..., 3] -> [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_matrix(R, t):
    """(R, t) -> [..., 4, 4] homogeneous matrix."""
    bot = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), R.shape[:-2] + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def rot_to_quat(R):
    """[..., 3, 3] -> quaternion [..., 4] (w, x, y, z), w >= 0.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the numerically best (largest pivot)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)
    # candidate quats, each scaled by 4*pivot
    cand_w = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., pivot, 4]
    pivots = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    q = jnp.take_along_axis(
        cands, k[..., None, None] * jnp.ones_like(cands[..., :1, :], dtype=k.dtype), axis=-2
    )[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    sign = jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    return q * sign


def orthonormalize(R):
    """Project [..., 3, 3] near-rotations back onto SO(3) via a quaternion
    roundtrip (branch-free Shepperd + unit quaternion). Composing poses in
    float32 frame after frame drifts R off the manifold GEOMETRICALLY (the
    velocity/seed chain amplifies the deviation ~2.4x per frame; a long
    marker-free stretch reaches det(R) ~ 0.8 within ~25 frames). The
    reference never sees this because every g2o pose roundtrips through a
    unit-quaternion SE3Quat (g2o se3quat.h) — this is that renormalization
    for the TPU engine's matrix-valued poses."""
    return quat_to_rot(rot_to_quat(R))


def quat_to_rot(q):
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


# ---------------------------------------------------------------------------
# Sim3 (s, R, t): x -> s * R x + t. Replaces g2o/types/sim3.h.
# ---------------------------------------------------------------------------


def sim3_apply(s, R, t, x):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, x) + t


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) * (sb,Rb,tb)."""
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return s, R, t


def sim3_inverse(s, R, t):
    sinv = 1.0 / jnp.maximum(s, _EPS)
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -sinv[..., None] * jnp.einsum("...ij,...j->...i", Rinv, t)
    return sinv, Rinv, tinv


def sim3_exp(xi):
    """sim3 exp. xi = [..., 7] = (upsilon, omega, sigma); returns (s, R, t).

    Uses the closed-form W matrix (Strasdat's thesis); Taylor fallbacks keep it
    differentiable at theta = sigma = 0."""
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 < _EPS, 1.0, theta2))
    theta = jnp.where(theta2 < _EPS, jnp.zeros_like(theta), theta)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)

    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    theta_safe = jnp.where(small_theta, 1.0, theta)

    # coefficients of W-matrix: V = A*I + B*W + C*W^2 (per Sophus RxSO3/Sim3)
    # A = (s-1)/sigma ; with rotation:
    #   B = (sigma*(s*sin - 0) ... ) -- use the standard formulas:
    X = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / sigma_safe)
    # a = s*sin(theta), b = s*cos(theta)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c2 = sigma * sigma + theta2
    c2_safe = jnp.where(c2 < 1e-12, 1.0, c2)
    A_rot = jnp.where(
        small_theta,
        jnp.zeros_like(theta),
        (a_ * sigma + (1.0 - b_) * theta) / (theta_safe * c2_safe),
    )
    B_rot = jnp.where(
        small_theta,
        jnp.zeros_like(theta),
        (X - ((b_ - 1.0) * sigma + a_ * theta) / c2_safe) / jnp.where(small_theta, 1.0, theta2),
    )
    # no-rotation limit: V = X * I
    A = jnp.where(small_theta, jnp.zeros_like(A_rot), A_rot)
    B = jnp.where(small_theta, jnp.zeros_like(B_rot), B_rot)
    V = X[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return s, R, t


def sim3_log(s, R, t):
    """Inverse of sim3_exp -> [..., 7] (upsilon, omega, sigma).

    Computed by inverting the W matrix numerically (3x3 solve — cheap and
    avoids the many Taylor branches of the analytic inverse)."""
    sigma = jnp.log(jnp.maximum(s, _EPS))
    w = so3_log(R)
    xi_rs = jnp.concatenate([jnp.zeros_like(w), w, sigma[..., None]], axis=-1)
    # recompute V from (w, sigma) as in sim3_exp, then solve V v = t
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.where(theta2 < _EPS, 1.0, theta2))
    theta = jnp.where(theta2 < _EPS, jnp.zeros_like(theta), theta)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), R.shape)
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-5
    sigma_safe = jnp.where(small_sigma, 1.0, sigma)
    theta_safe = jnp.where(small_theta, 1.0, theta)
    X = jnp.where(small_sigma, 1.0 + sigma / 2.0, (s - 1.0) / sigma_safe)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)
    c2 = sigma * sigma + theta2
    c2_safe = jnp.where(c2 < 1e-12, 1.0, c2)
    A = jnp.where(
        small_theta, jnp.zeros_like(theta), (a_ * sigma + (1.0 - b_) * theta) / (theta_safe * c2_safe)
    )
    B = jnp.where(
        small_theta,
        jnp.zeros_like(theta),
        (X - ((b_ - 1.0) * sigma + a_ * theta) / c2_safe) / jnp.where(small_theta, 1.0, theta2),
    )
    V = X[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * (W @ W)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, xi_rs[..., 3:]], axis=-1)
