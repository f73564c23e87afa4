"""Small generic Levenberg–Marquardt utilities shared by the optimizers.

Replaces g2o's OptimizationAlgorithmLevenberg
(Thirdparty/g2o/g2o/core/optimization_algorithm_levenberg.cpp) with
fixed-iteration, jit-compatible loops: no data-dependent Python control flow;
step accept/reject and lambda adaptation happen with lax-friendly selects.
"""

from __future__ import annotations

import jax.numpy as jnp


def diag_embed(d):
    n = d.shape[-1]
    return d[..., None] * jnp.eye(n, dtype=d.dtype)


def small_spd_solve(H, b):
    """Unrolled Cholesky solve for small SPD systems (n <= ~8), batched over
    leading dims. Inside jitted LM loops this fuses into plain VPU arithmetic
    instead of a per-iteration linalg custom call — the inner pose-LM loop
    runs 40-80 solves per frame, so the dispatch overhead matters."""
    n = H.shape[-1]
    # Cholesky: H = L L^T, unrolled with static indices
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def solve_damped(H, b, lam):
    """Solve (H + lam*diag(H) + eps*I) dx = b, batched.

    The tiny identity keeps padded/empty problems solvable; non-finite
    solutions (fully masked problems) are zeroed so they are no-ops."""
    d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-10)
    Hd = H + lam[..., None, None] * diag_embed(d) + 1e-10 * jnp.eye(
        H.shape[-1], dtype=H.dtype
    )
    if H.shape[-1] <= 8:
        dx = small_spd_solve(Hd, b)
    else:
        dx = jnp.linalg.solve(Hd, b[..., None])[..., 0]
    return jnp.where(jnp.isfinite(dx), dx, jnp.zeros_like(dx))
