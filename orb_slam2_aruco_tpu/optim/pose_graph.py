"""Sim3 pose-graph (essential graph) optimization for loop correction.

Replaces Optimizer::OptimizeEssentialGraph (reference src/Optimizer.cc:
1245-1542): Sim3 vertices per keyframe; loop / spanning-tree / strong-covis
edges with relative Sim3 measurements; Gauss-Newton with tiny damping
(reference lambda_init = 1e-16) for 20 iterations; fixed loop keyframe.

Edge residual: r = log_sim3( S_ji^meas · S_iw · S_jw^{-1} ) with vertex
updates S_iw <- exp(xi_i) · S_iw. Per-edge [7,7] Jacobians via vmapped
forward-mode autodiff; the dense normal system over 7K variables is solved
with Cholesky — K <= 256 keyframes gives <= 1792^2, ideal MXU material.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.geometry.lie import (
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)
from orb_slam2_aruco_tpu.optim.lm import diag_embed


class PoseGraphResult(NamedTuple):
    s: jnp.ndarray   # [K]
    R: jnp.ndarray   # [K, 3, 3]
    t: jnp.ndarray   # [K, 3]
    chi2: jnp.ndarray


def _edge_residual(xi_i, xi_j, s_i, R_i, t_i, s_j, R_j, t_j, sm, Rm, tm):
    """r = log( S_m · (exp(xi_i) S_iw) · (exp(xi_j) S_jw)^{-1} ), [7]."""
    dsi, dRi, dti = sim3_exp(xi_i)
    si, Ri, ti = sim3_compose(dsi, dRi, dti, s_i, R_i, t_i)
    dsj, dRj, dtj = sim3_exp(xi_j)
    sj, Rj, tj = sim3_compose(dsj, dRj, dtj, s_j, R_j, t_j)
    sji, Rji, tji = sim3_inverse(sj, Rj, tj)
    se, Re, te = sim3_compose(si, Ri, ti, sji, Rji, tji)   # S_iw S_wj
    se, Re, te = sim3_compose(sm, Rm, tm, se, Re, te)      # S_m S_iw S_wj
    return sim3_log(se, Re, te)


def optimize_pose_graph(
    s,            # [K] current Sim3 vertex scales (S_iw: world -> kf i)
    R,            # [K, 3, 3]
    t,            # [K, 3]
    e_i,          # [E] edge source vertex (i)
    e_j,          # [E] edge target vertex (j)
    e_meas_s,     # [E] measured S_ji scale (maps i-frame to j-frame... see note)
    e_meas_R,     # [E, 3, 3]
    e_meas_t,     # [E, 3]
    e_mask,       # [E]
    free,         # [K] 1.0 for free vertices, 0.0 for fixed (loop KF)
    iters: int = 20,
    lam: float = 1e-16,
    fix_scale: bool = False,
) -> PoseGraphResult:
    """Note on measurement convention: the residual is
    log(S_m · S_iw · S_wj), so S_m must equal (S_iw S_wj)^{-1} = S_jw S_wi at
    the true solution — i.e. S_m = S_ji measured as `pose of world-in-j
    composed with world-from-i`, matching g2o EdgeSim3 with vertices (i, j).
    """
    K = s.shape[0]
    E = e_i.shape[0]
    zero2 = jnp.zeros((2, 7), dtype=t.dtype)

    def edge_r_and_J(si_, Ri_, ti_, sj_, Rj_, tj_, sm, Rm, tm):
        def f(xis):
            return _edge_residual(
                xis[0], xis[1], si_, Ri_, ti_, sj_, Rj_, tj_, sm, Rm, tm
            )

        r = f(zero2)
        J = jax.jacfwd(f)(zero2)  # [7, 2, 7]
        return r, J[:, 0, :], J[:, 1, :]

    edge_fn = jax.vmap(edge_r_and_J)

    def gn_iter(it, state):
        s, R, t = state
        r, Ji, Jj = edge_fn(
            s[e_i], R[e_i], t[e_i], s[e_j], R[e_j], t[e_j],
            e_meas_s, e_meas_R, e_meas_t,
        )  # r [E,7], Ji/Jj [E,7,7]
        w = e_mask
        Ji = Ji * free[e_i][:, None, None]
        Jj = Jj * free[e_j][:, None, None]
        # dense normal equations over [K, 7]
        Hii = jax.ops.segment_sum(
            jnp.einsum("eai,e,eaj->eij", Ji, w, Ji), e_i, num_segments=K
        )
        Hjj = jax.ops.segment_sum(
            jnp.einsum("eai,e,eaj->eij", Jj, w, Jj), e_j, num_segments=K
        )
        Hij = jax.ops.segment_sum(
            jnp.einsum("eai,e,eaj->eij", Ji, w, Jj), e_i * K + e_j,
            num_segments=K * K,
        ).reshape(K, K, 7, 7)
        bi = jax.ops.segment_sum(
            -jnp.einsum("eai,e,ea->ei", Ji, w, r), e_i, num_segments=K
        )
        bj = jax.ops.segment_sum(
            -jnp.einsum("eai,e,ea->ei", Jj, w, r), e_j, num_segments=K
        )
        H = jnp.zeros((K, K, 7, 7), dtype=t.dtype)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(Hii + Hjj)
        H = H + Hij + jnp.swapaxes(jnp.swapaxes(Hij, 0, 1), -1, -2)
        b = (bi + bj).reshape(K * 7)
        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        free_vec = jnp.repeat(free, 7)
        if fix_scale:
            # bFixScale=true (reference OptimizeEssentialGraph for marker
            # maps): the sigma component of every vertex stays 0
            dim_mask = jnp.tile(
                jnp.asarray([1.0] * 6 + [0.0], dtype=free_vec.dtype), K
            )
            free_vec = free_vec * dim_mask
        Hd = Hd * free_vec[:, None] * free_vec[None, :]
        d = jnp.maximum(jnp.diagonal(Hd), 1e-12)
        Hd = Hd + jnp.diag(lam * d + 1e-8 + (1.0 - free_vec))
        dx = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), b * free_vec)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(K, 7)
        ds, dR, dt = sim3_exp(dx)
        s, R, t = sim3_compose(ds, dR, dt, s, R, t)
        return (s, R, t)

    s, R, t = jax.lax.fori_loop(0, iters, gn_iter, (s, R, t))
    r, _, _ = edge_fn(
        s[e_i], R[e_i], t[e_i], s[e_j], R[e_j], t[e_j],
        e_meas_s, e_meas_R, e_meas_t,
    )
    chi2 = jnp.sum(jnp.sum(r * r, axis=-1) * e_mask)
    return PoseGraphResult(s=s, R=R, t=t, chi2=chi2)
