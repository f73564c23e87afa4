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


def solve_damped(H, b, lam):
    """Solve (H + lam*diag(H) + eps*I) dx = b, batched.

    The tiny identity keeps padded/empty problems solvable; non-finite
    solutions (fully masked problems) are zeroed so they are no-ops."""
    d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-10)
    Hd = H + lam[..., None, None] * diag_embed(d) + 1e-10 * jnp.eye(
        H.shape[-1], dtype=H.dtype
    )
    dx = jnp.linalg.solve(Hd, b[..., None])[..., 0]
    return jnp.where(jnp.isfinite(dx), dx, jnp.zeros_like(dx))
