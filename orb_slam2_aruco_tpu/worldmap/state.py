"""The world map as one fixed-capacity pytree.

Replaces the reference's pointer-graph of Map / MapPoint / KeyFrame /
MapAruco objects + ~20 mutexes (reference src/Map.cc, src/MapPoint.cc,
src/KeyFrame.cc, src/MapAruco.cc) with arrays + validity masks: SLAM's
dynamic insert/erase becomes masked slot allocation, and every consumer
(tracking, BA, loop closing) reads the same immutable snapshot — the
functional-core design dissolves the reference's lock discipline
(SURVEY.md §2.3, §5 'race detection').

Shapes (capacities from MapConfig):
  K = max_keyframes, N = features/frame, L = max_points, M = max_markers,
  A = max markers observed per keyframe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig


class MapState(NamedTuple):
    # --- keyframes -------------------------------------------------------
    kf_Rcw: jnp.ndarray        # [K, 3, 3] world->camera
    kf_tcw: jnp.ndarray        # [K, 3]
    kf_valid: jnp.ndarray      # [K] bool
    kf_frame_id: jnp.ndarray   # [K] int32 source frame index
    kf_ts: jnp.ndarray         # [K] float32 timestamp (coarse; the authoritative
                               # float64 stamps live host-side in
                               # SlamSystem.kf_ts64 and in the checkpoint —
                               # epoch-scale stamps lose ~100 s in f32)
    kf_seq: jnp.ndarray        # [K] int32 monotone insertion sequence number
                               # (-1 = empty). Unlike the slot index this
                               # keeps ordering semantics when slots are
                               # recycled by keyframe culling.
    # per-keyframe features (immutable after insertion, like the reference)
    kf_kp_uv: jnp.ndarray      # [K, N, 2] undistorted pixels
    kf_kp_octave: jnp.ndarray  # [K, N] int32
    kf_kp_angle: jnp.ndarray   # [K, N] float32
    kf_desc: jnp.ndarray       # [K, N, 8] uint32 packed ORB
    kf_kp_valid: jnp.ndarray   # [K, N] bool
    kf_obs_point: jnp.ndarray  # [K, N] int32 map-point slot per feature (-1)
    # --- map points ------------------------------------------------------
    pt_xyz: jnp.ndarray        # [L, 3]
    pt_valid: jnp.ndarray      # [L] bool
    pt_desc: jnp.ndarray       # [L, 8] uint32 representative descriptor
    pt_normal: jnp.ndarray     # [L, 3] mean viewing direction
    pt_min_dist: jnp.ndarray   # [L] scale-invariance band (PredictScale inputs)
    pt_max_dist: jnp.ndarray   # [L]
    pt_ref_kf: jnp.ndarray     # [L] int32 anchor keyframe slot
    pt_found: jnp.ndarray      # [L] float32 'found' counter
    pt_visible: jnp.ndarray    # [L] float32 'visible' counter
    pt_first_kf: jnp.ndarray   # [L] int32 creating keyframe's INSERTION SEQ
                               # (kf_seq value, not the slot: culling age and
                               # fusion ordering stay correct when keyframe
                               # slots are recycled)
    pt_aruco: jnp.ndarray      # [L] int32 marker SLOT whose observed quad
                               # contains this point's feature (-1 = none) —
                               # the reference's persistent marker<->point
                               # correlation (MapPoint forflag/mArucoID,
                               # MapPoint.cc:132, LocalMapping.cc:469-485),
                               # filled at plane-update time
    pt_obs_kf: jnp.ndarray     # [L, K] bool point<->keyframe incidence
                               # (which KFs observe each point; lets the
                               # covisibility-local map be two matmuls
                               # instead of a sort/scatter). Updated at KF
                               # insertion and triangulation; fusion leaves
                               # absorbed sources' history with the target's
                               # own row (best-effort, masked by pt_valid).
    # --- markers (SE3 landmarks) ----------------------------------------
    mk_Rwm: jnp.ndarray        # [M, 3, 3] marker->world
    mk_twm: jnp.ndarray        # [M, 3]
    mk_id: jnp.ndarray         # [M] int32 ArUco id (-1 = free slot)
    mk_valid: jnp.ndarray      # [M] bool
    mk_side: jnp.ndarray       # [M] float32 side length
    mk_well: jnp.ndarray       # [M] bool isWellComputed (plane-fit promoted)
    mk_nbad: jnp.ndarray       # [M] int32 nBadComputed counter
    mk_mean_len: jnp.ndarray   # [M] float32 measured side length accumulator
    mk_len_cnt: jnp.ndarray    # [M] float32
    # per-keyframe marker observations
    kf_mk_slot: jnp.ndarray    # [K, A] int32 marker slot (-1)
    kf_mk_uv: jnp.ndarray      # [K, A, 4, 2] observed (undistorted) corners
    kf_mk_valid: jnp.ndarray   # [K, A] bool
    kf_mk_old: jnp.ndarray     # [K, A] bool — 'old/loop' markers (mvbOldAruco)
    # --- persistent loop edges (KeyFrame::AddLoopEdge, reference
    # src/KeyFrame.cc:515-525): every closed loop is stored as a permanent
    # keyframe pair and re-enters EVERY subsequent essential-graph
    # optimization (Optimizer.cc:1390-1414) so old seams cannot tear ------
    loop_i: jnp.ndarray        # [E] int32 current-side keyframe slot
    loop_j: jnp.ndarray        # [E] int32 loop-side keyframe slot
    loop_valid: jnp.ndarray    # [E] bool
    # --- retrieval (place recognition) ----------------------------------
    kf_bow: jnp.ndarray        # [K, W] float32 l2-normalized word histogram
    # --- scalars ---------------------------------------------------------
    scale_done: jnp.ndarray    # [] bool — one-shot metric scale correction done
    big_change_idx: jnp.ndarray  # [] int32 (Map::InformNewBigChange)
    next_seq: jnp.ndarray      # [] int32 — next keyframe insertion sequence

    @property
    def K(self):
        return self.kf_valid.shape[0]

    @property
    def L(self):
        return self.pt_valid.shape[0]

    @property
    def M(self):
        return self.mk_valid.shape[0]

    def num_keyframes(self):
        return jnp.sum(self.kf_valid.astype(jnp.int32))

    def num_points(self):
        return jnp.sum(self.pt_valid.astype(jnp.int32))

    def num_markers(self):
        return jnp.sum(self.mk_valid.astype(jnp.int32))


def empty_map(cfg: SlamConfig, num_words: int = None) -> MapState:
    K = cfg.map.max_keyframes
    N = cfg.orb.num_features
    L = cfg.map.max_points
    M = cfg.map.max_markers
    A = cfg.aruco.max_markers_per_frame
    W = num_words if num_words is not None else cfg.retrieval.num_words
    f32 = jnp.float32
    eye = jnp.broadcast_to(jnp.eye(3, dtype=f32), (K, 3, 3))
    eyem = jnp.broadcast_to(jnp.eye(3, dtype=f32), (M, 3, 3))
    return MapState(
        kf_Rcw=eye,
        kf_tcw=jnp.zeros((K, 3), f32),
        kf_valid=jnp.zeros((K,), bool),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_ts=jnp.zeros((K,), f32),
        kf_seq=jnp.full((K,), -1, jnp.int32),
        kf_kp_uv=jnp.zeros((K, N, 2), f32),
        kf_kp_octave=jnp.zeros((K, N), jnp.int32),
        kf_kp_angle=jnp.zeros((K, N), f32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_obs_point=jnp.full((K, N), -1, jnp.int32),
        pt_xyz=jnp.zeros((L, 3), f32),
        pt_valid=jnp.zeros((L,), bool),
        pt_desc=jnp.zeros((L, 8), jnp.uint32),
        pt_normal=jnp.zeros((L, 3), f32),
        pt_min_dist=jnp.zeros((L,), f32),
        pt_max_dist=jnp.full((L,), 1e9, f32),
        pt_ref_kf=jnp.full((L,), -1, jnp.int32),
        pt_found=jnp.ones((L,), f32),
        pt_visible=jnp.ones((L,), f32),
        pt_first_kf=jnp.full((L,), -1, jnp.int32),
        pt_aruco=jnp.full((L,), -1, jnp.int32),
        pt_obs_kf=jnp.zeros((L, K), bool),
        mk_Rwm=eyem,
        mk_twm=jnp.zeros((M, 3), f32),
        mk_id=jnp.full((M,), -1, jnp.int32),
        mk_valid=jnp.zeros((M,), bool),
        mk_side=jnp.full((M,), cfg.aruco.marker_size, f32),
        mk_well=jnp.zeros((M,), bool),
        mk_nbad=jnp.zeros((M,), jnp.int32),
        mk_mean_len=jnp.zeros((M,), f32),
        mk_len_cnt=jnp.zeros((M,), f32),
        kf_mk_slot=jnp.full((K, A), -1, jnp.int32),
        kf_mk_uv=jnp.zeros((K, A, 4, 2), f32),
        kf_mk_valid=jnp.zeros((K, A), bool),
        kf_mk_old=jnp.zeros((K, A), bool),
        loop_i=jnp.full((cfg.map.max_loop_edges,), -1, jnp.int32),
        loop_j=jnp.full((cfg.map.max_loop_edges,), -1, jnp.int32),
        loop_valid=jnp.zeros((cfg.map.max_loop_edges,), bool),
        kf_bow=jnp.zeros((K, W), f32),
        scale_done=jnp.asarray(False),
        big_change_idx=jnp.asarray(0, jnp.int32),
        next_seq=jnp.asarray(0, jnp.int32),
    )


def first_free_slot(valid):
    """Index of the first invalid slot (capacity overflow returns the last
    slot — callers should check num_free first on the host)."""
    free = ~valid
    return jnp.argmax(free.astype(jnp.int32))


def free_slots(valid, count):
    """First `count` free slot indices (padded with the last index)."""
    order = jnp.argsort(valid.astype(jnp.int32), stable=True)
    return order[:count]


def marker_slot_for_id(state: MapState, aruco_id):
    """Slot holding a given ArUco id, or -1."""
    hit = (state.mk_id == aruco_id) & state.mk_valid
    slot = jnp.argmax(hit.astype(jnp.int32))
    return jnp.where(jnp.any(hit), slot, -1)
