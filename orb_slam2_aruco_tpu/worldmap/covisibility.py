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
    """[K, L] 1.0 where keyframe k observes point l — a masked transpose of
    the maintained [L, K] observation table (state.pt_obs_kf, kept in sync
    by create/fuse/cull). The previous formulation re-derived this from
    kf_obs_point via a segment-scatter into K*L = 5M segments, which alone
    cost ~1.4 s/call on a v5e and dominated every covisibility consumer
    (loop detection, BA problem building)."""
    inc = state.pt_obs_kf & state.pt_valid[:, None] & state.kf_valid[None, :]
    return inc.T.astype(dtype)


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
