"""Tracking: per-frame pose estimation with the marker-first cascade.

Replaces Tracking::Track (reference src/Tracking.cc:192-492) and its helpers:
  * CheckArucoID (Tracking.cc:856-908)          -> bind_markers
  * IsArucoWellTrack (Tracking.cc:1062-1168)    -> aruco_pose_candidate
  * TrackByAruco (Tracking.cc:1170-1240)        -> track_frame(seed='aruco')
  * TrackWithMotionModel (Tracking.cc:995-1060) -> track_frame(seed='motion')
  * TrackReferenceKeyFrame (Tracking.cc:910-982)-> track_vs_keyframe
  * TrackLocalMap (Tracking.cc:1242-1293)       -> track_local_map
  * RelocalizationByAruco (Tracking.cc:1665-1739) -> aruco_pose_candidate too

Every function is a fixed-shape jitted step; the cascade's branching lives in
the host System loop which only inspects returned scalars.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import se3_apply, se3_compose, se3_inverse
from orb_slam2_aruco_tpu.ops import matching
from orb_slam2_aruco_tpu.optim import pnp, pose_opt
from orb_slam2_aruco_tpu.worldmap import retrieval
from orb_slam2_aruco_tpu.optim.residuals import marker_corner_points_world
from orb_slam2_aruco_tpu.pipeline.frontend import Frame, make_frame, scale_sigma2
from orb_slam2_aruco_tpu.worldmap.state import MapState


class TrackResult(NamedTuple):
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    obs_point: jnp.ndarray   # [N] int32 map-point slot per current feature
    n_inliers: jnp.ndarray   # int32
    n_matches: jnp.ndarray   # int32 (pre-optimization matches)


# ---------------------------------------------------------------------------
# markers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=())
def bind_markers(state: MapState, frame: Frame):
    """[A] map marker slot for each frame marker id (-1 if not in map)."""
    ids = frame.mk_ids  # [A]
    eq = (ids[:, None] == state.mk_id[None, :]) & state.mk_valid[None, :] & (
        ids[:, None] >= 0
    )
    slot = jnp.argmax(eq.astype(jnp.int32), axis=1)
    return jnp.where(jnp.any(eq, axis=1), slot, -1)


def old_marker_flags(state: MapState, slots, min_gap: int):
    """[A] bool: bound marker whose LATEST observing keyframe is at least
    `min_gap` keyframes old — the reference's mvbOldAruco rule (CheckArucoID,
    Tracking.cc:856-908): such markers are excluded from pose estimation and
    instead signal a loop, until CorrectLoopByAruco clears the flag."""
    K, Amap = state.kf_mk_slot.shape
    slots_safe = jnp.maximum(slots, 0)
    observes = (
        (state.kf_mk_slot[:, :, None] == slots_safe[None, None, :])
        & state.kf_mk_valid[:, :, None]
        & state.kf_valid[:, None, None]
    ).any(axis=1)                                        # [K, A]
    fid = jnp.where(state.kf_valid, state.kf_frame_id, -1)
    latest_fid = jnp.max(
        jnp.where(observes, fid[:, None], -1), axis=0
    )                                                    # [A]
    # insertion-rank gap between the newest keyframe and the latest observer
    rank = jnp.sum(
        (fid[:, None] > fid[None, :]) & state.kf_valid[None, :], axis=1
    )
    newest_rank = jnp.max(jnp.where(state.kf_valid, rank, -1))
    latest_rank = jnp.max(
        jnp.where(observes, rank[:, None], -1), axis=0
    )
    gap = newest_rank - latest_rank
    return (slots >= 0) & (latest_fid >= 0) & (gap >= min_gap)


def marker_observer_kf(state: MapState, slots):
    """Most recent valid keyframe observing any of the bound marker slots
    (the reference's RelocalizationByAruco iterates the marker's observing
    keyframes, Tracking.cc:1694+). Returns -1 if none."""
    valid_slot = slots >= 0
    eq = (
        (state.kf_mk_slot[:, :, None] == jnp.maximum(slots, 0)[None, None, :])
        & state.kf_mk_valid[:, :, None]
        & valid_slot[None, None, :]
    ).any(axis=(1, 2))
    observes = eq & state.kf_valid
    fid = jnp.where(observes, state.kf_frame_id, -1)
    k = jnp.argmax(fid)
    return jnp.where(jnp.any(observes), k, -1).astype(jnp.int32)


def _marker_obs_arrays(state: MapState, frame: Frame, slots, old=None):
    """Gather fixed-marker edge inputs for pose optimization: corners_w
    [A, 4, 3], uv [A, 4, 2], mask [A] for frame markers bound to the map.
    Only 'good' (IPPE-unambiguous) in-map markers participate, and old/loop
    markers are excluded — the reference gates per-frame with mvbArucoGood
    and mvbOldAruco (Optimizer.cc:628-676)."""
    slots_safe = jnp.maximum(slots, 0)
    Rwm = state.mk_Rwm[slots_safe]
    twm = state.mk_twm[slots_safe]
    side = state.mk_side[slots_safe]
    corners_w = jax.vmap(marker_corner_points_world)(Rwm, twm, side)
    mask = (slots >= 0) & frame.mk_good & frame.mk_valid
    if old is not None:
        mask = mask & ~old
    return corners_w, frame.mk_corners, mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def aruco_pose_candidate(state: MapState, frame: Frame, slots,
                         cam: Camera, cfg: SlamConfig, old=None,
                         err_th=None):
    """Best camera pose implied by a single bound marker, scored by the
    reprojection of ALL bound markers (IsArucoWellTrack / marker reloc).

    Returns (ok, Rcw, tcw, mean_err): ok if the best candidate's mean corner
    reprojection error < threshold."""
    A = slots.shape[0]
    slots_safe = jnp.maximum(slots, 0)
    Rwm = state.mk_Rwm[slots_safe]          # [A, 3, 3]
    twm = state.mk_twm[slots_safe]
    # candidate pose from marker a: Tcw = Tcm(a) * Tmw(a)
    Rmw, tmw = se3_inverse(Rwm, twm)
    Rc = jnp.einsum("aij,ajk->aik", frame.mk_Rcm, Rmw)
    tc = jnp.einsum("aij,aj->ai", frame.mk_Rcm, tmw) + frame.mk_tcm
    cand_ok = (slots >= 0) & frame.mk_good & frame.mk_valid
    if old is not None:
        cand_ok = cand_ok & ~old

    corners_w, uv_obs, mask = _marker_obs_arrays(state, frame, slots, old)
    cw_flat = corners_w.reshape(-1, 3)      # [4A, 3]
    uv_flat = uv_obs.reshape(-1, 2)
    m_flat = jnp.repeat(mask.astype(jnp.float32), 4)

    def score(Rcw, tcw):
        p = jnp.einsum("ij,nj->ni", Rcw, cw_flat) + tcw
        uv = cam_mod.project(cam, p)
        err = jnp.linalg.norm(uv - uv_flat, axis=-1)
        err = jnp.where(p[:, 2] > 0.02, err, 1e6)
        wsum = jnp.maximum(jnp.sum(m_flat), 1.0)
        return jnp.sum(err * m_flat) / wsum

    errs = jax.vmap(score)(Rc, tc)          # [A]
    errs = jnp.where(cand_ok, errs, 1e9)
    best = jnp.argmin(errs)
    th = cfg.aruco.well_tracked_reproj_err if err_th is None else err_th
    ok = errs[best] < th
    return ok, Rc[best], tc[best], errs[best]


# ---------------------------------------------------------------------------
# point matching + pose refinement
# ---------------------------------------------------------------------------


def _point_world_arrays(state: MapState, obs_point):
    safe = jnp.maximum(obs_point, 0)
    pts = state.pt_xyz[safe]
    valid = (obs_point >= 0) & state.pt_valid[safe]
    return pts, valid


def local_point_mask(state: MapState, obs_point, max_local_kfs: int):
    """([L] bool, best_kf): points observed by the covisibility-local keyframe
    set — the keyframes sharing map points with the current frame, capped at
    max_local_kfs by share count (UpdateLocalKeyFrames <=80,
    Tracking.cc:1555-1663). Two passes over the [L, K] point<->KF incidence
    matrix (MXU-friendly; no sorts or large scatters).

    best_kf is the keyframe sharing the MOST points with the current frame
    (-1 if none) — the reference re-targets mpReferenceKF to it every frame
    (Tracking.cc:1588-1593 pKFmax), which NeedNewKeyFrame's nRefMatches and
    the reference-KF fallback seed then use."""
    K = state.K
    L = state.L
    obs_set = jnp.zeros((L,), bool).at[jnp.maximum(obs_point, 0)].max(
        obs_point >= 0
    )
    inc = state.pt_obs_kf & state.kf_valid[None, :]          # [L, K]
    share = jnp.dot(
        obs_set.astype(jnp.float32), inc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)                                      # [K]
    kth = jax.lax.top_k(share, min(max_local_kfs, K))[0][-1]
    local_kf = (share > 0) & (share >= kth) & state.kf_valid
    mask = jnp.any(inc & local_kf[None, :], axis=1)
    best_kf = jnp.where(
        jnp.any(local_kf), jnp.argmax(share).astype(jnp.int32), -1
    )
    # no local keyframes (e.g. empty first-stage): fall back to all points
    return jnp.where(jnp.any(local_kf), mask, jnp.ones((L,), bool)), best_kf


def _optimize(state, frame, slots, Rcw0, tcw0, obs_point, cam, cfg: SlamConfig,
              old=None, rounds=None, iters_per_round=None):
    pts, pvalid = _point_world_arrays(state, obs_point)
    inv_s2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)[
        frame.kp_octave
    ]
    corners_w, uv_mk, m_mask = _marker_obs_arrays(state, frame, slots, old)
    res = pose_opt.optimize_pose(
        Rcw0, tcw0, cam,
        pts, frame.kp_uv, pvalid & frame.kp_valid, inv_s2,
        marker_corners_w=corners_w, marker_uv=uv_mk,
        marker_mask=m_mask,
        marker_weight=cfg.aruco.edge_weight,
        chi2_th=cfg.optim.chi2_mono,
        huber_delta=cfg.optim.huber_delta,
        rounds=cfg.optim.pose_rounds if rounds is None else rounds,
        iters_per_round=(cfg.optim.pose_iters_per_round
                         if iters_per_round is None else iters_per_round),
    )
    obs_out = jnp.where(res.inliers, obs_point, -1)
    return res, obs_out


@functools.partial(jax.jit, static_argnames=("cfg", "seed_budget"))
def track_frame(
    state: MapState,
    frame: Frame,
    slots,                  # [A] bound marker slots
    Rcw0, tcw0,             # pose seed (motion model or aruco candidate)
    last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
    cam: Camera,
    cfg: SlamConfig,
    search_radius: float,
    old=None,
    seed_budget: bool = False,   # trimmed LM (2x6): the two-stage chunk's
                                 # stage-1 pose is only a SEED for the
                                 # batched local-map refinement
) -> TrackResult:
    """Project last frame's map points with the seed pose and window-match
    (TrackWithMotionModel / TrackByAruco body). The rotation-consistency
    histogram applies here exactly like the reference's frame<->last-frame
    SearchByProjection (mbCheckOrientation, src/ORBmatcher.cc:1332+): both
    sides are FRAMES with per-keypoint angles, so rolling/rotating motion
    prunes the matches whose orientation offset disagrees with the dominant
    bins. (The local-map search has no equivalent — map points carry no
    orientation, matching the reference's map-point SearchByProjection.)"""
    pts, pvalid = _point_world_arrays(state, last_obs)
    pvalid = pvalid & last_valid
    p_cam = se3_apply(Rcw0[None], tcw0[None], pts)
    uv_pred = cam_mod.project(cam, p_cam)
    in_front = p_cam[..., 2] > 0.05
    in_img = cam_mod.in_image(cam, uv_pred, margin=1.0)
    m = matching.match_in_window(
        last_desc, frame.desc, uv_pred, frame.kp_uv,
        radius=search_radius,
        mask_a=pvalid & in_front & in_img, mask_b=frame.kp_valid,
        octave_a=last_octave, octave_b=frame.kp_octave, max_octave_diff=1,
        max_dist=float(cfg.matcher.th_high),
        nn_ratio=cfg.matcher.nn_ratio_tracking,
        angles_a=last_angle, angles_b=frame.kp_angle,
        check_rotation=cfg.matcher.check_orientation,
        histo_length=cfg.matcher.histo_length,
    )
    # scatter: current feature idx -> map point slot
    N = frame.kp_uv.shape[0]
    obs_point = jnp.full((N,), -1, jnp.int32)
    tgt = jnp.where(m.valid, m.idx, N)  # invalid -> dumped past the end
    src_pts = jnp.where(m.valid, last_obs, -1)
    obs_point = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].max(src_pts)[:N]
    n_matches = jnp.sum(m.valid.astype(jnp.int32))
    res, obs_out = _optimize(
        state, frame, slots, Rcw0, tcw0, obs_point, cam, cfg, old,
        rounds=cfg.tracking.seed_rounds if seed_budget else None,
        iters_per_round=cfg.tracking.seed_iters if seed_budget else None,
    )
    return TrackResult(res.Rcw, res.tcw, obs_out, res.n_inliers, n_matches)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_vs_keyframe(
    state: MapState,
    frame: Frame,
    slots,
    kf: jnp.ndarray,        # keyframe slot to match against
    Rcw0, tcw0,
    cam: Camera,
    cfg: SlamConfig,
    old=None,
) -> TrackResult:
    """Descriptor-only matching against one keyframe's map-point features
    (TrackReferenceKeyFrame; the reference restricts candidates via BoW
    nodes — here the full distance matrix is one matmul so no restriction is
    needed, only ratio + rotation gates)."""
    kf_desc = state.kf_desc[kf]
    kf_obs = state.kf_obs_point[kf]
    kf_valid = state.kf_kp_valid[kf] & (kf_obs >= 0)
    kf_valid = kf_valid & state.pt_valid[jnp.maximum(kf_obs, 0)]
    d = matching.distance_matrix(kf_desc, frame.desc, kf_valid, frame.kp_valid)
    m = matching.nn_match(
        d, max_dist=float(cfg.matcher.th_low),
        nn_ratio=cfg.matcher.nn_ratio_init, mutual=True,
    )
    m = matching.rotation_consistency(
        state.kf_kp_angle[kf], frame.kp_angle,
        matching.Matches(idx=m.idx, dist=m.dist, valid=m.valid),
        cfg.matcher.histo_length,
    ) if cfg.matcher.check_orientation else m
    N = frame.kp_uv.shape[0]
    tgt = jnp.where(m.valid, m.idx, N)
    src_pts = jnp.where(m.valid, kf_obs, -1)
    obs_point = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].max(src_pts)[:N]
    n_matches = jnp.sum(m.valid.astype(jnp.int32))
    res, obs_out = _optimize(state, frame, slots, Rcw0, tcw0, obs_point, cam,
                             cfg, old)
    return TrackResult(res.Rcw, res.tcw, obs_out, res.n_inliers, n_matches)


@functools.partial(jax.jit, static_argnames=("cfg", "max_candidates"))
def reloc_candidates(state: MapState, frame: Frame, cfg: SlamConfig,
                     max_candidates: int = 4):
    """BoW relocalization candidates (DetectRelocalizationCandidates,
    reference src/KeyFrameDatabase.cc:199+): same shared-word and covisible-
    group accumulation as loop candidates, minus the minScore gate."""
    from orb_slam2_aruco_tpu.worldmap.covisibility import covisibility_matrix

    W = covisibility_matrix(state)
    return retrieval.detect_candidates_grouped(
        frame.bow, state.kf_bow, state.kf_valid,
        covis_w=W.astype(jnp.float32),
        exclude_mask=jnp.zeros_like(state.kf_valid),
        min_score=0.0, max_candidates=max_candidates,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def reloc_pnp(state: MapState, frame: Frame, slots, kf: jnp.ndarray,
              cam: Camera, cfg: SlamConfig) -> TrackResult:
    """Relocalization against one candidate keyframe: descriptor 2D-3D
    matching + RANSAC PnP + pose LM (reference Relocalization,
    Tracking.cc:1741-1914: SearchByBoW -> EPnP RANSAC ->
    PoseOptimizationByAruco >= 50 inliers)."""
    kf_obs = state.kf_obs_point[kf]
    kf_valid = (
        state.kf_kp_valid[kf]
        & (kf_obs >= 0)
        & state.pt_valid[jnp.maximum(kf_obs, 0)]
    )
    d = matching.distance_matrix(
        state.kf_desc[kf], frame.desc, kf_valid, frame.kp_valid
    )
    m = matching.nn_match(d, max_dist=float(cfg.matcher.th_low),
                          nn_ratio=0.75, mutual=True)
    # 2D-3D: current feature m.idx[i] <-> world point kf_obs[i]
    N = frame.kp_uv.shape[0]
    tgt = jnp.where(m.valid, m.idx, N)
    src = jnp.where(m.valid, kf_obs, -1)
    obs_point = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].max(src)[:N]
    pts, pvalid = _point_world_arrays(state, obs_point)
    res = pnp.ransac_pnp(
        pts, frame.kp_uv, pvalid & frame.kp_valid, cam,
        chi2_th=cfg.optim.chi2_mono,
        min_inliers=cfg.tracking.min_inliers_track,
    )
    opt, obs_out = _optimize(
        state, frame, slots, res.Rcw, res.tcw, obs_point, cam, cfg
    )
    n = jnp.where(res.ok, opt.n_inliers, 0)
    return TrackResult(opt.Rcw, opt.tcw, obs_out, n, res.n_inliers)


@functools.partial(jax.jit, static_argnames=("cfg", "radius_scale"))
def track_local_map(
    state: MapState,
    frame: Frame,
    slots,
    Rcw0, tcw0,
    obs_point,              # [N] associations from the first-stage track
    cam: Camera,
    cfg: SlamConfig,
    old=None,
    pt_candidates=None,     # [L] bool — the LOCAL map (None = all points)
    radius_scale: float = 1.0,   # widened windows for coarse seeds
) -> TrackResult:
    """Search unmatched map points by projection and re-optimize
    (TrackLocalMap + SearchLocalPoints). `pt_candidates` restricts the search
    to the covisibility-local map (UpdateLocalKeyFrames/Points,
    Tracking.cc:1519-1663) — matching against the WHOLE map would silently
    re-link revisited areas and suppress loop closure."""
    L = state.L
    pts = state.pt_xyz
    p_cam = se3_apply(Rcw0[None], tcw0[None], pts)
    uv_pred = cam_mod.project(cam, p_cam)
    dist = jnp.linalg.norm(p_cam, axis=-1)
    visible = (
        state.pt_valid
        & (p_cam[..., 2] > 0.05)
        & cam_mod.in_image(cam, uv_pred, margin=1.0)
        & (dist >= 0.8 * state.pt_min_dist)
        & (dist <= 1.2 * state.pt_max_dist)
    )
    # viewing angle gate: cos(angle(normal, view)) > 0.5 (reference isInFrustum)
    Rwc, twc = se3_inverse(Rcw0, tcw0)
    view = pts - twc[None]
    vn = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    cosang = jnp.sum(vn * state.pt_normal, axis=-1)
    has_normal = jnp.linalg.norm(state.pt_normal, axis=-1) > 0.1
    visible = visible & (~has_normal | (cosang > 0.5))
    # already-matched points should not be re-assigned
    already = jnp.zeros((L,), bool).at[jnp.maximum(obs_point, 0)].set(
        obs_point >= 0
    )
    cand = visible & ~already
    if pt_candidates is not None:
        cand = cand & pt_candidates
    # predicted observation octave from the scale-invariance band
    # (MapPoint::PredictScale, reference src/MapPoint.cc:414): the search
    # radius grows with the predicted octave exactly like the reference's
    # SearchLocalPoints windows (ORBmatcher.cc:45-138) — a fixed pixel
    # radius starves coarse-octave points of matches
    sf = cfg.orb.scale_factor
    lvl_ratio = jnp.maximum(state.pt_max_dist, 1e-6) / jnp.maximum(dist, 1e-6)
    oct_pred = jnp.clip(
        jnp.ceil(jnp.log(lvl_ratio) / jnp.log(sf)), 0, cfg.orb.num_levels - 1
    ).astype(jnp.int32)                                           # [L]
    # compact the candidate set before matching: the local map holds a few
    # thousand points at most, so the [L, N] distance/window matrices would
    # be mostly masked-out work for large L
    C = min(L, cfg.tracking.local_map_candidates)
    cscore, cidx = jax.lax.top_k(cand.astype(jnp.int32), C)
    csel = cscore > 0
    # match candidate points' descriptors to unmatched current features
    feat_free = frame.kp_valid & (obs_point < 0)
    m = matching.match_in_window(
        state.pt_desc[cidx], frame.desc, uv_pred[cidx], frame.kp_uv,
        radius=cfg.matcher.search_radius_map * radius_scale
        * (sf ** oct_pred[cidx].astype(jnp.float32)),
        mask_a=csel, mask_b=feat_free,
        octave_a=oct_pred[cidx], octave_b=frame.kp_octave,
        max_octave_diff=1,
        max_dist=float(cfg.matcher.th_high),
        nn_ratio=cfg.matcher.nn_ratio_tracking,
    )
    N = frame.kp_uv.shape[0]
    tgt = jnp.where(m.valid, m.idx, N)
    src = jnp.where(m.valid, cidx, -1)
    new_obs = jnp.zeros((N + 1,), jnp.int32).at[:].set(-1).at[tgt].max(src)[:N]
    obs_point = jnp.where(obs_point >= 0, obs_point, new_obs)
    n_matches = jnp.sum((obs_point >= 0).astype(jnp.int32))
    res, obs_out = _optimize(state, frame, slots, Rcw0, tcw0, obs_point, cam,
                             cfg, old)
    # visibility bookkeeping (found/visible ratios, MapPoint.cc:359 analogue)
    found_sel = jnp.zeros((L,), bool).at[jnp.maximum(obs_out, 0)].set(obs_out >= 0)
    new_visible = state.pt_visible + visible.astype(jnp.float32)
    new_found = state.pt_found + found_sel.astype(jnp.float32)
    return TrackResult(res.Rcw, res.tcw, obs_out, res.n_inliers, n_matches), (
        new_visible,
        new_found,
    )


class FullTrackResult(NamedTuple):
    Rcw: jnp.ndarray
    tcw: jnp.ndarray
    obs_point: jnp.ndarray
    n_inliers: jnp.ndarray       # final (local-map) inliers
    n_first_stage: jnp.ndarray   # inliers after the first-stage track
    used_aruco: jnp.ndarray      # bool
    used_ref_kf: jnp.ndarray     # bool (fell back to reference-KF matching)
    slots: jnp.ndarray           # [A] marker binding
    old_flags: jnp.ndarray       # [A] mvbOldAruco (loop markers)
    any_new_marker: jnp.ndarray  # bool — fresh good marker in view
    pt_visible: jnp.ndarray      # updated map counters
    pt_found: jnp.ndarray
    ctrl: jnp.ndarray            # [20] f32: everything the host loop needs in
                                 # ONE device->host read (this environment's
                                 # relay has ~1 s per-readback latency):
                                 # [n_inl, n_first, aruco, refkf, new_mk,
                                 #  Rcw(9), tcw(3), n_ref_matches3,
                                 #  n_ref_matches2, ref_kf] — tail fields are
                                 # the reference-KF tracked-point counts at
                                 # minObs=3/2 (NeedNewKeyFrame inputs,
                                 # Tracking.cc:1323-1329) and the UPDATED
                                 # reference keyframe slot
                                 # (UpdateLocalKeyFrames pKFmax)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_batch(
    state: MapState,
    imgs,                    # [B, H, W] frame chunk (uint8/float)
    R_last, t_last,          # pose of the frame before the chunk
    vel_R, vel_t, has_vel,   # motion model state
    last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
    ref_kf,
    cam: Camera,
    cfg: SlamConfig,
):
    """Localization-mode tracking of a CHUNK of consecutive frames as one
    device program: the frontend (ORB pyramid + ArUco detect + BoW) has no
    cross-frame dependency, so it runs BATCHED over the whole chunk (vmap —
    one wide pass instead of B sequential narrow ones; at 960x540 a single
    frame leaves most of the chip idle), and only the pose cascade, which is
    inherently sequential (frame i+1 is seeded by frame i's optimized pose),
    runs as a lax.scan. No host round trip per frame — the dispatch+readback
    latency amortizes over the chunk. The reference's two-pass CLI drives
    exactly this localization phase (mono_cvcam.cc:183-235).
    Returns (ctrls [B, 20], final carry) — ctrl layout per
    FullTrackResult.ctrl: 5 flags, Rcw (9), tcw (3), 3 tail."""
    frames = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)

    if cfg.tracking.loc_two_stage and cfg.tracking.loc_seed_mode == "extrapolate":
        # ---- extrapolated chunk: ZERO sequential passes ------------------
        # Seeds come from composing the previous chunk's one-frame velocity
        # i+1 times (a 16-step scan of 3x3 composes — microseconds), with a
        # per-frame ABSOLUTE marker pose candidate overriding whenever a
        # well-tracked marker is visible (markers bound the extrapolation
        # error regardless of chunk length — this is the marker-SLAM serving
        # case). Each frame then matches the map DIRECTLY at a widened
        # radius and refines; the standard local-map refine pass follows.
        # Both passes are vmapped across the chunk: unlike the "scan" mode
        # there is no sequential stage at all, which removes the cascade's
        # dominant latency-bound cost. Frames whose seed was still too far
        # off fail the inlier gate in ctrl and the stream's rewind machinery
        # replays them through the per-frame path (localize_stream).
        B = imgs.shape[0]

        def vel_step(carry, _):
            Rp, tp = carry
            Rn, tn = se3_compose(vel_R, vel_t, Rp, tp)
            return (Rn, tn), (Rn, tn)

        _, (R_ex, t_ex) = jax.lax.scan(
            vel_step, (R_last, t_last), None, length=B
        )
        R_seed = jnp.where(has_vel, R_ex,
                           jnp.broadcast_to(R_last, R_ex.shape))
        t_seed = jnp.where(has_vel, t_ex,
                           jnp.broadcast_to(t_last, t_ex.shape))

        def seed_one(frame, Rp, tp):
            slots = bind_markers(state, frame)
            # localization-only serving tracks against a FINAL map: the
            # old-marker exclusion exists so SLAM-mode tracking does not
            # anchor to pre-loop-correction marker poses (mvbOldAruco,
            # Tracking.cc:856-908) — but here every marker is "old" by
            # construction (last observed during the mapping pass), the map
            # is consistent, and the ABSOLUTE marker seed is precisely what
            # bounds the extrapolation error. Without it a velocity
            # reversal mid-chunk fails the whole chunk into the per-frame
            # rewind path (~10x slower serving).
            old = jnp.zeros_like(slots, dtype=bool)
            # SEED gate, not the IsArucoWellTrack trust-as-final-pose gate:
            # the seed only needs to land within the widened match window
            # (~25 px) — the full local-map LM refine follows. The tight
            # 2 px gate dropped ~5 frames per sweep whose extrapolated seed
            # was also stale (the turn), failing whole chunks into the
            # per-frame rewind path.
            ok_a, R_a, t_a, _ = aruco_pose_candidate(
                state, frame, slots, cam, cfg, old=old,
                err_th=cfg.tracking.loc_seed_marker_err,
            )
            R0 = jnp.where(ok_a, R_a, Rp)
            t0 = jnp.where(ok_a, t_a, tp)
            no_obs = jnp.full((frame.kp_uv.shape[0],), -1, jnp.int32)
            tr1, (vis1, found1) = track_local_map(
                state, frame, slots, R0, t0, no_obs, cam, cfg, old=old,
                radius_scale=cfg.tracking.loc_extrap_radius_scale,
            )
            need_ref = tr1.n_inliers < cfg.tracking.min_inliers_track
            return (TrackResult(tr1.Rcw, tr1.tcw, tr1.obs_point,
                                tr1.n_inliers, tr1.n_matches),
                    slots, old, ok_a, need_ref, vis1, found1)

        trs, slots_b, old_b, oka_b, needref_b, vis_b, found_b = jax.vmap(
            seed_one
        )(frames, R_seed, t_seed)
        if cfg.tracking.loc_extrap_passes <= 1:
            # the wide pass is final: assemble the FullTrackResult/ctrl
            # without a second local-map search (the pass-1 optimize already
            # is a full local-map refinement, just with wider match windows)
            outs = jax.vmap(
                lambda frame, tr, slots, old, ok_a, need_ref, vis1, found1:
                _result_from_track(state, frame, tr, slots, old, ok_a,
                                   need_ref, ref_kf, cfg, vis1, found1)
            )(frames, trs, slots_b, old_b, oka_b, needref_b, vis_b, found_b)
        else:
            outs = jax.vmap(
                lambda frame, tr, slots, old, ok_a, need_ref: _cascade_refine(
                    state, frame, tr, slots, old, ok_a, need_ref, ref_kf,
                    cam, cfg,
                )
            )(frames, trs, slots_b, old_b, oka_b, needref_b)

        vis = state.pt_visible + jnp.sum(
            outs.pt_visible - state.pt_visible[None], axis=0
        )
        found = state.pt_found + jnp.sum(
            outs.pt_found - state.pt_found[None], axis=0
        )
        lastf = jax.tree_util.tree_map(lambda a: a[B - 1], frames)
        R_prev = outs.Rcw[B - 2] if B >= 2 else R_last
        t_prev = outs.tcw[B - 2] if B >= 2 else t_last
        Rp_inv, tp_inv = se3_inverse(R_prev, t_prev)
        vR2, vt2 = se3_compose(outs.Rcw[B - 1], outs.tcw[B - 1],
                               Rp_inv, tp_inv)
        ok_last = outs.n_inliers[B - 1] >= cfg.tracking.min_matches_local_map
        carry = (
            outs.Rcw[B - 1], outs.tcw[B - 1], vR2, vt2, ok_last,
            lastf.kp_uv, lastf.desc, outs.obs_point[B - 1], lastf.kp_valid,
            lastf.kp_octave, lastf.kp_angle, vis, found,
        )
        return outs.ctrl, carry

    if cfg.tracking.loc_two_stage:
        # ---- two-stage chunk: sequential seeds, batched refinement ------
        # Only the cheap motion-model cascade is inherently sequential
        # (frame i+1's search window comes from frame i's pose); the
        # expensive local-map matching + LM refine of EVERY frame then runs
        # as one wide vmapped batch that actually fills the chip. Frame
        # i+1 seeds from frame i's STAGE-1 pose — in steady-state tracking
        # that differs from the refined pose by well under the search
        # radius, and each frame's final pose is still its own full
        # local-map optimization.
        def seed_step(carry, frame):
            (Rl, tl, vR, vt, hv, luv, ldesc, lobs, lval, loct, lang) = carry
            Rp, tp = se3_compose(vR, vt, Rl, tl)
            R_pred = jnp.where(hv, Rp, Rl)
            t_pred = jnp.where(hv, tp, tl)
            tr, slots, old, ok_a, need_ref = _cascade_seed(
                state, frame, R_pred, t_pred, Rl, tl,
                luv, ldesc, lobs, lval, loct, lang, ref_kf, cam, cfg,
                seed_budget=True,
            )
            Rl_inv, tl_inv = se3_inverse(Rl, tl)
            vR2, vt2 = se3_compose(tr.Rcw, tr.tcw, Rl_inv, tl_inv)
            # gate the motion model on stage-1 inliers like the sequential
            # path does — a mid-chunk tracking failure must fall back to the
            # last pose, not propagate a garbage constant-velocity seed
            ok1 = tr.n_inliers >= cfg.tracking.min_matches_local_map
            carry2 = (
                tr.Rcw, tr.tcw, vR2, vt2, ok1,
                frame.kp_uv, frame.desc, tr.obs_point, frame.kp_valid,
                frame.kp_octave, frame.kp_angle,
            )
            return carry2, (tr, slots, old, ok_a, need_ref)

        carry0s = (
            R_last, t_last, vel_R, vel_t, has_vel,
            last_uv, last_desc, last_obs, last_valid, last_octave,
            last_angle,
        )
        _, (trs, slots_b, old_b, oka_b, needref_b) = jax.lax.scan(
            seed_step, carry0s, frames
        )

        outs = jax.vmap(
            lambda frame, tr, slots, old, ok_a, need_ref: _cascade_refine(
                state, frame, tr, slots, old, ok_a, need_ref, ref_kf, cam,
                cfg,
            )
        )(frames, trs, slots_b, old_b, oka_b, needref_b)

        B = imgs.shape[0]
        # merge per-frame visible/found deltas (each frame counted against
        # the same input stats; localization mode never culls, so additive
        # merging preserves the totals)
        vis = state.pt_visible + jnp.sum(
            outs.pt_visible - state.pt_visible[None], axis=0
        )
        found = state.pt_found + jnp.sum(
            outs.pt_found - state.pt_found[None], axis=0
        )
        lastf = jax.tree_util.tree_map(lambda a: a[B - 1], frames)
        R_prev = outs.Rcw[B - 2] if B >= 2 else R_last
        t_prev = outs.tcw[B - 2] if B >= 2 else t_last
        Rp_inv, tp_inv = se3_inverse(R_prev, t_prev)
        vR2, vt2 = se3_compose(outs.Rcw[B - 1], outs.tcw[B - 1],
                               Rp_inv, tp_inv)
        ok_last = outs.n_inliers[B - 1] >= cfg.tracking.min_matches_local_map
        carry = (
            outs.Rcw[B - 1], outs.tcw[B - 1], vR2, vt2, ok_last,
            lastf.kp_uv, lastf.desc, outs.obs_point[B - 1], lastf.kp_valid,
            lastf.kp_octave, lastf.kp_angle, vis, found,
        )
        return outs.ctrl, carry

    def step(carry, frame):
        (Rl, tl, vR, vt, hv, luv, ldesc, lobs, lval, loct, lang, vis,
         found) = carry
        st = state._replace(pt_visible=vis, pt_found=found)
        Rp, tp = se3_compose(vR, vt, Rl, tl)
        R_pred = jnp.where(hv, Rp, Rl)
        t_pred = jnp.where(hv, tp, tl)
        out = track_full(
            st, frame, R_pred, t_pred, Rl, tl,
            luv, ldesc, lobs, lval, loct, lang, ref_kf, cam, cfg,
        )
        ok = out.n_inliers >= cfg.tracking.min_matches_local_map
        Rl_inv, tl_inv = se3_inverse(Rl, tl)
        vR2, vt2 = se3_compose(out.Rcw, out.tcw, Rl_inv, tl_inv)
        carry2 = (
            out.Rcw, out.tcw, vR2, vt2, ok,
            frame.kp_uv, frame.desc, out.obs_point, frame.kp_valid,
            frame.kp_octave, frame.kp_angle, out.pt_visible, out.pt_found,
        )
        return carry2, out.ctrl

    carry0 = (
        R_last, t_last, vel_R, vel_t, has_vel,
        last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
        state.pt_visible, state.pt_found,
    )
    carry, ctrls = jax.lax.scan(step, carry0, frames)
    return ctrls, carry


def _cascade_seed(
    state: MapState,
    frame: Frame,
    R_pred, t_pred,
    R_last, t_last,
    last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
    ref_kf,
    cam: Camera,
    cfg: SlamConfig,
    seed_budget: bool = False,
):
    """First half of the per-frame cascade — marker seed + motion-model
    tracking with widened-window and reference-KF fallbacks (the reference's
    IsArucoWellTrack/TrackByAruco/TrackWithMotionModel/TrackReferenceKeyFrame
    ladder, src/Tracking.cc:233-258) — WITHOUT the local-map refinement.
    Split out so track_batch can run this cheap sequential part as a scan
    and the expensive local-map half batched across the chunk.
    Returns (tr, slots, old, ok_a, need_ref)."""
    slots = bind_markers(state, frame)
    old = old_marker_flags(state, slots, cfg.loop.min_kfs_between_loops)
    ok_a, R_a, t_a, _ = aruco_pose_candidate(state, frame, slots, cam, cfg,
                                             old=old)
    R0 = jnp.where(ok_a, R_a, R_pred)
    t0 = jnp.where(ok_a, t_a, t_pred)

    tr1 = track_frame(
        state, frame, slots, R0, t0,
        last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
        cam, cfg, search_radius=cfg.matcher.search_radius_motion, old=old,
        seed_budget=seed_budget,
    )

    # widened-window retry (TrackWithMotionModel, Tracking.cc:1010-1015):
    # fewer than 20 window matches -> search again at twice the radius. This
    # is what survives sudden velocity reversals, where the constant-velocity
    # seed points the wrong way and the narrow window finds nothing.
    need_wide = tr1.n_matches < 20

    def wide_branch(_):
        return track_frame(
            state, frame, slots, R0, t0,
            last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
            cam, cfg, search_radius=2.0 * cfg.matcher.search_radius_motion,
            old=old, seed_budget=seed_budget,
        )

    tr1 = jax.lax.cond(need_wide, wide_branch, lambda _: tr1, None)

    need_ref = tr1.n_inliers < cfg.tracking.min_inliers_track

    def ref_branch(_):
        # TrackReferenceKeyFrame seeds from the LAST pose, not the motion
        # prediction (Tracking.cc:910-982 uses mLastFrame.mTcw)
        return track_vs_keyframe(
            state, frame, slots, ref_kf, R_last, t_last, cam, cfg, old=old
        )

    def keep_branch(_):
        return tr1

    tr = jax.lax.cond(need_ref, ref_branch, keep_branch, None)
    return tr, slots, old, ok_a, need_ref


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_full(
    state: MapState,
    frame: Frame,
    R_pred, t_pred,          # motion-model seed
    R_last, t_last,          # last pose (fallback seed)
    last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
    ref_kf,
    cam: Camera,
    cfg: SlamConfig,
) -> FullTrackResult:
    """The whole per-frame OK-state cascade as ONE jitted step — a single
    device dispatch per frame instead of five (the reference's Track(),
    src/Tracking.cc:192-492, minus keyframe creation which only runs on
    insertion). Branching uses lax.cond on traced scalars."""
    tr, slots, old, ok_a, need_ref = _cascade_seed(
        state, frame, R_pred, t_pred, R_last, t_last,
        last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
        ref_kf, cam, cfg,
    )
    return _cascade_refine(state, frame, tr, slots, old, ok_a, need_ref,
                           ref_kf, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def track_full_img(
    state: MapState,
    img,                     # [H, W] raw frame
    R_pred, t_pred,
    R_last, t_last,
    last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
    ref_kf,
    cam: Camera,
    cfg: SlamConfig,
):
    """Frontend + full tracking cascade fused into ONE dispatch:
    (make_frame, track_full) as a single device program. On relay-attached
    TPUs every dispatch pays a per-call round trip that triples in bad
    weather — the pipelined SLAM path uses this to halve its per-frame
    relay interactions. Returns (frame, FullTrackResult)."""
    frame = make_frame(img, cam, cfg)
    out = track_full(
        state, frame, R_pred, t_pred, R_last, t_last,
        last_uv, last_desc, last_obs, last_valid, last_octave, last_angle,
        ref_kf, cam, cfg,
    )
    return frame, out


def _result_from_track(
    state: MapState,
    frame: Frame,
    tr,                     # TrackResult of an already-final local-map pass
    slots, old, ok_a, need_ref,
    ref_kf,
    cfg: SlamConfig,
    pt_visible, pt_found,
) -> FullTrackResult:
    """Assemble a FullTrackResult/ctrl from a finished local-map track —
    the bookkeeping half of _cascade_refine without a second search pass
    (extrapolate mode with loc_extrap_passes=1, where the wide seed pass
    already ran the full local-map optimization)."""
    _, best_kf = local_point_mask(
        state, tr.obs_point, cfg.tracking.max_local_keyframes
    )
    any_new = jnp.any(frame.mk_good & frame.mk_valid & (slots < 0))
    ref_kf = jnp.where(best_kf >= 0, best_kf, ref_kf)
    ref_obs = state.kf_obs_point[ref_kf]
    ref_obs_safe = jnp.maximum(ref_obs, 0)
    ref_pt_ok = (ref_obs >= 0) & state.pt_valid[ref_obs_safe]
    obs_count = jnp.sum(
        (state.pt_obs_kf & state.kf_valid[None, :]).astype(jnp.int32), axis=1
    )
    ref_cnt = obs_count[ref_obs_safe]
    n_ref3 = jnp.sum((ref_pt_ok & (ref_cnt >= 3)).astype(jnp.int32))
    n_ref2 = jnp.sum((ref_pt_ok & (ref_cnt >= 2)).astype(jnp.int32))
    ctrl = jnp.concatenate([
        jnp.stack([
            tr.n_inliers.astype(jnp.float32),
            tr.n_inliers.astype(jnp.float32),
            ok_a.astype(jnp.float32),
            need_ref.astype(jnp.float32),
            any_new.astype(jnp.float32),
        ]),
        tr.Rcw.reshape(9),
        tr.tcw,
        jnp.stack([n_ref3.astype(jnp.float32), n_ref2.astype(jnp.float32),
                   ref_kf.astype(jnp.float32)]),
    ])
    return FullTrackResult(
        Rcw=tr.Rcw, tcw=tr.tcw, obs_point=tr.obs_point,
        n_inliers=tr.n_inliers, n_first_stage=tr.n_inliers,
        used_aruco=ok_a, used_ref_kf=need_ref, slots=slots, old_flags=old,
        any_new_marker=any_new, pt_visible=pt_visible, pt_found=pt_found,
        ctrl=ctrl,
    )


def _cascade_refine(
    state: MapState,
    frame: Frame,
    tr,
    slots, old, ok_a, need_ref,
    ref_kf,
    cam: Camera,
    cfg: SlamConfig,
) -> FullTrackResult:
    """Second half of the per-frame cascade: local-map search + pose refine
    (TrackLocalMap, src/Tracking.cc:1242-1293) and the NeedNewKeyFrame
    inputs. Has no dependence on neighboring frames' results, so
    track_batch can vmap it across a whole localization chunk."""
    pt_local, best_kf = local_point_mask(
        state, tr.obs_point, cfg.tracking.max_local_keyframes
    )
    (tr2, (vis, found)) = track_local_map(
        state, frame, slots, tr.Rcw, tr.tcw, tr.obs_point, cam, cfg, old=old,
        pt_candidates=pt_local,
    )
    any_new = jnp.any(frame.mk_good & frame.mk_valid & (slots < 0))
    # reference-KF tracked-point counts (nRefMatches = TrackedMapPoints(minObs),
    # reference KeyFrame.cc / Tracking.cc:1323-1329) for NeedNewKeyFrame —
    # counted on the UPDATED reference keyframe (UpdateLocalKeyFrames runs
    # before NeedNewKeyFrame in the reference)
    ref_kf = jnp.where(best_kf >= 0, best_kf, ref_kf)
    ref_obs = state.kf_obs_point[ref_kf]                        # [N]
    ref_obs_safe = jnp.maximum(ref_obs, 0)
    ref_pt_ok = (ref_obs >= 0) & state.pt_valid[ref_obs_safe]
    obs_count = jnp.sum(
        (state.pt_obs_kf & state.kf_valid[None, :]).astype(jnp.int32), axis=1
    )                                                           # [L]
    ref_cnt = obs_count[ref_obs_safe]
    n_ref3 = jnp.sum((ref_pt_ok & (ref_cnt >= 3)).astype(jnp.int32))
    n_ref2 = jnp.sum((ref_pt_ok & (ref_cnt >= 2)).astype(jnp.int32))
    ctrl = jnp.concatenate([
        jnp.stack([
            tr2.n_inliers.astype(jnp.float32),
            tr.n_inliers.astype(jnp.float32),
            ok_a.astype(jnp.float32),
            need_ref.astype(jnp.float32),
            any_new.astype(jnp.float32),
        ]),
        tr2.Rcw.reshape(9),
        tr2.tcw,
        jnp.stack([n_ref3.astype(jnp.float32), n_ref2.astype(jnp.float32),
                   ref_kf.astype(jnp.float32)]),
    ])
    return FullTrackResult(
        Rcw=tr2.Rcw, tcw=tr2.tcw, obs_point=tr2.obs_point,
        n_inliers=tr2.n_inliers, n_first_stage=tr.n_inliers,
        used_aruco=ok_a, used_ref_kf=need_ref, slots=slots, old_flags=old,
        any_new_marker=any_new, pt_visible=vis, pt_found=found,
        ctrl=ctrl,
    )
