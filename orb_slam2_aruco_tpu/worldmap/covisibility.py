"""Covisibility graph as one matmul.

Replaces KeyFrame::UpdateConnections + the ordered neighbor lists (reference
src/KeyFrame.cc:386-476): the weight between two keyframes is the number of
shared map points. With the observation table kf_obs_point [K, N] scattered
into a binary incidence matrix B [K, L], the full covisibility matrix is
W = B B^T — one MXU matmul instead of per-keyframe hash-map counting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.worldmap.state import MapState


def incidence_matrix(state: MapState, dtype=jnp.bfloat16):
    """[K, L] 1.0 where keyframe k observes point l."""
    K, N = state.kf_obs_point.shape
    L = state.L
    from orb_slam2_aruco_tpu.optim.segsum import segment_sum_sorted

    obs = jnp.where(state.kf_kp_valid, state.kf_obs_point, -1)
    kf_idx = jnp.broadcast_to(jnp.arange(K)[:, None], (K, N))
    ids = jnp.where(
        obs.reshape(-1) >= 0,
        kf_idx.reshape(-1) * L + jnp.clip(obs.reshape(-1), 0, L - 1),
        K * L,
    )
    cntKL = segment_sum_sorted(
        jnp.ones((K * N,), jnp.float32), ids, K * L
    ).reshape(K, L)
    B = jnp.minimum(cntKL, 1.0)
    B = B * state.pt_valid[None, :].astype(jnp.float32)
    B = B * state.kf_valid[:, None].astype(jnp.float32)
    return B.astype(dtype)


def covisibility_matrix(state: MapState):
    """[K, K] int32 shared-point counts (diagonal = own point count)."""
    B = incidence_matrix(state)
    W = jnp.dot(B, B.T, preferred_element_type=jnp.float32)
    return W.astype(jnp.int32)


def covisible_neighbors(W, kf, min_weight: int, max_n: int):
    """Top-max_n covisible keyframes of `kf` with weight >= min_weight.
    Returns (slots [max_n], weights [max_n], valid [max_n])."""
    row = W[kf].at[kf].set(0)
    vals, idx = jax.lax.top_k(row, max_n)
    valid = vals >= min_weight
    return idx, vals, valid


def spanning_parent(W, kf_valid, kf_order):
    """Parent of each keyframe = its best covisible among EARLIER keyframes
    (mirrors the reference's spanning tree: parent = top covisible at first
    connection, KeyFrame.cc:441-475). kf_order: [K] insertion order index
    (kf_frame_id works). Returns [K] int32 parent slot (-1 for roots)."""
    K = W.shape[0]
    earlier = (kf_order[None, :] < kf_order[:, None]) & kf_valid[None, :]
    Wm = jnp.where(earlier, W, -1)
    parent = jnp.argmax(Wm, axis=1)
    has = jnp.max(Wm, axis=1) > 0
    return jnp.where(has & kf_valid, parent, -1)
