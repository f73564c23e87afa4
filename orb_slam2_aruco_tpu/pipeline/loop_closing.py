"""Loop closing: marker-id loop detection, Sim3 computation, loop correction.

Replaces LoopClosing (reference src/LoopClosing.cc):
  * DetectLoopByAruco (:116-189)  -> detect_loop_by_marker: a marker observed
    by an old, non-covisible keyframe IS a loop signal — no appearance model
    needed.
  * BoW detection (:191-360)      -> detect_loop_by_bow (retrieval scores +
    covisibility exclusion).
  * ComputeSim3ByAruco (:362-483) -> compute_sim3: Sim3 seeded from the
    relative marker pose (s=1, markers are metric), refined on point matches
    with optim.sim3_opt.
  * CorrectLoopByAruco (:656-887) -> correct_loop: Sim3 propagation of the
    current covisible group, point correction, marker re-anchoring,
    essential-graph optimization (optim.pose_graph), and a final global BA
    (mapping.bundle_adjust window_all) — sequential phases instead of the
    reference's detached GBA thread.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.ippe import ippe_square
from orb_slam2_aruco_tpu.geometry.lie import (
    rot_to_quat,
    se3_apply,
    se3_compose,
    se3_inverse,
    sim3_compose,
    sim3_inverse,
)
from orb_slam2_aruco_tpu.ops import matching
from orb_slam2_aruco_tpu.optim import pose_graph, sim3_opt
from orb_slam2_aruco_tpu.pipeline.frontend import scale_sigma2
from orb_slam2_aruco_tpu.worldmap.covisibility import covisibility_matrix
from orb_slam2_aruco_tpu.worldmap.state import MapState


class LoopDetection(NamedTuple):
    found: jnp.ndarray       # bool
    kf_loop: jnp.ndarray     # int32 loop keyframe slot
    marker_slot: jnp.ndarray  # int32 shared marker slot (-1 if BoW loop)


@functools.partial(jax.jit, static_argnames=("min_gap",))
def detect_loop_by_marker(state: MapState, kf_cur, min_gap: int = 10):
    """A marker observed by the current KF and by an old keyframe that is NOT
    covisible with it signals a loop."""
    K, A = state.kf_mk_slot.shape
    W = covisibility_matrix(state)
    cur_slots = state.kf_mk_slot[kf_cur]                 # [A]
    # only markers FLAGGED old in the current keyframe can signal a loop
    # (the reference's mvbOldAruco, set by CheckArucoID when the marker's
    # LATEST observation is old, Tracking.cc:856-908, and cleared by
    # CorrectLoopByAruco :732-735): a marker that is being tracked
    # continuously — e.g. right after a closed loop — must not re-trigger,
    # or every post-loop keyframe re-corrects an already-consistent map
    # with fresh marker-IPPE noise
    cur_valid = (
        state.kf_mk_valid[kf_cur] & (cur_slots >= 0)
        & state.kf_mk_old[kf_cur]
    )
    # observers[k, a]: does KF k observe cur marker a?
    obs = (
        (state.kf_mk_slot[:, :, None] == cur_slots[None, None, :])
        & state.kf_mk_valid[:, :, None]
    ).any(axis=1)                                        # [K, A]
    fid_cur = state.kf_frame_id[kf_cur]
    old = (
        state.kf_valid
        & (state.kf_frame_id < fid_cur)
        & (W[kf_cur] < 15)                               # non-covisible
    )
    old = old.at[kf_cur].set(False)
    cand = obs & old[:, None] & cur_valid[None, :]       # [K, A]
    # gap in keyframe count: require the observer to be old enough
    order_gap = jnp.sum(
        (state.kf_frame_id[:, None] > state.kf_frame_id[None, :])
        & state.kf_valid[None, :],
        axis=1,
    )  # insertion rank of each KF
    rank_cur = order_gap[kf_cur]
    cand = cand & ((rank_cur - order_gap[:, None]) >= min_gap)
    any_c = jnp.any(cand)
    # among candidate observers prefer the keyframe with the most surviving
    # map points: the Sim3 verification projects the loop side's points, so
    # an observer whose points were all culled/fused away can never verify
    # (the reference tries EVERY observer in mmIDandKFs, LoopClosing.cc:
    # 362-483; scoring by point count reaches the same winner in one pass)
    pts_of_kf = jnp.sum(
        (state.kf_obs_point >= 0)
        & state.pt_valid[jnp.maximum(state.kf_obs_point, 0)],
        axis=1, dtype=jnp.int32,
    )  # [K]
    score = jnp.where(cand, pts_of_kf[:, None], -1)      # [K, A]
    flat = jnp.argmax(score.reshape(-1))
    k_best = flat // A
    a_best = flat % A
    return LoopDetection(
        found=any_c,
        kf_loop=jnp.where(any_c, k_best, -1).astype(jnp.int32),
        marker_slot=jnp.where(any_c, cur_slots[a_best], -1).astype(jnp.int32),
    )


def _marker_cam_pose(state: MapState, kf, marker_slot, cam: Camera):
    """T_cam_marker recomputed by IPPE from the stored corner observations of
    `marker_slot` in keyframe `kf` (best solution)."""
    A = state.kf_mk_slot.shape[1]
    hit = (state.kf_mk_slot[kf] == marker_slot) & state.kf_mk_valid[kf]
    a = jnp.argmax(hit.astype(jnp.int32))
    uv = state.kf_mk_uv[kf, a]                           # [4, 2]
    xn = cam_mod.pixels_to_normalized(cam, uv)
    res = ippe_square(state.mk_side[marker_slot], xn[None])
    return res.R[0, 0], res.t[0, 0], jnp.any(hit)


class Sim3Candidate(NamedTuple):
    ok: jnp.ndarray
    s: jnp.ndarray          # Sim3 cur <- loop  (camera frames)
    R: jnp.ndarray
    t: jnp.ndarray
    n_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg",))
def compute_sim3(state: MapState, kf_cur, kf_loop, marker_slot,
                 cam: Camera, cfg: SlamConfig) -> Sim3Candidate:
    """Relative Sim3 (cur <- loop camera frame) seeded by the shared marker,
    refined on point matches (ComputeSim3ByAruco)."""
    # seed from marker: T_cur_loop = T_cur_m * inv(T_loop_m), s = 1
    Rc_m, tc_m, ok1 = _marker_cam_pose(state, kf_cur, marker_slot, cam)
    Rl_m, tl_m, ok2 = _marker_cam_pose(state, kf_loop, marker_slot, cam)
    Rm_l, tm_l = se3_inverse(Rl_m, tl_m)
    R0, t0 = se3_compose(Rc_m, tc_m, Rm_l, tm_l)
    s0 = jnp.float32(1.0)

    # point matches cur <-> loop (descriptor NN, both must have map points)
    cur_obs = state.kf_obs_point[kf_cur]
    loop_obs = state.kf_obs_point[kf_loop]
    mask_cur = state.kf_kp_valid[kf_cur] & (cur_obs >= 0)
    mask_loop = state.kf_kp_valid[kf_loop] & (loop_obs >= 0)
    d = matching.distance_matrix(
        state.kf_desc[kf_cur], state.kf_desc[kf_loop], mask_cur, mask_loop
    )
    m = matching.nn_match(d, max_dist=float(cfg.matcher.th_low), nn_ratio=0.9,
                          mutual=True)
    # p1: cur's own map points in cur camera frame; p2: loop's map points in
    # loop camera frame (reference OptimizeSim3 vertex setup)
    X1 = state.pt_xyz[jnp.maximum(cur_obs, 0)]
    p1 = se3_apply(
        state.kf_Rcw[kf_cur][None], state.kf_tcw[kf_cur][None], X1
    )
    j = jnp.maximum(m.idx, 0)
    X2 = state.pt_xyz[jnp.maximum(loop_obs[j], 0)]
    p2 = se3_apply(
        state.kf_Rcw[kf_loop][None], state.kf_tcw[kf_loop][None], X2
    )
    uv1 = state.kf_kp_uv[kf_cur]
    uv2 = state.kf_kp_uv[kf_loop][j]
    sig2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)
    inv1 = sig2[state.kf_kp_octave[kf_cur]]
    inv2 = sig2[state.kf_kp_octave[kf_loop][j]]
    valid = m.valid & mask_cur & state.pt_valid[jnp.maximum(cur_obs, 0)] & \
        state.pt_valid[jnp.maximum(loop_obs[j], 0)]
    # Dual seed: the marker relative pose can pick the flipped IPPE solution
    # on near-frontal views; the map-estimate relative T_cur_w * T_w_loop is
    # immune to that but carries the accumulated drift. Optimize from both
    # and keep the higher-inlier solution.
    Rl_inv, tl_inv = se3_inverse(state.kf_Rcw[kf_loop], state.kf_tcw[kf_loop])
    R0b, t0b = se3_compose(state.kf_Rcw[kf_cur], state.kf_tcw[kf_cur],
                           Rl_inv, tl_inv)
    res_a = sim3_opt.optimize_sim3(
        s0, R0, t0, p1, p2, uv1, uv2, valid, inv1, inv2, cam,
        fix_scale=cfg.loop.fix_scale,
        iters_first=cfg.optim.sim3_iters,
        iters_second=2 * cfg.optim.sim3_iters,
    )
    res_b = sim3_opt.optimize_sim3(
        s0, R0b, t0b, p1, p2, uv1, uv2, valid, inv1, inv2, cam,
        fix_scale=cfg.loop.fix_scale,
        iters_first=cfg.optim.sim3_iters,
        iters_second=2 * cfg.optim.sim3_iters,
    )
    use_b = res_b.n_inliers > res_a.n_inliers
    res = sim3_opt.Sim3Result(
        s=jnp.where(use_b, res_b.s, res_a.s),
        R=jnp.where(use_b, res_b.R, res_a.R),
        t=jnp.where(use_b, res_b.t, res_a.t),
        inliers=jnp.where(use_b, res_b.inliers, res_a.inliers),
        n_inliers=jnp.maximum(res_a.n_inliers, res_b.n_inliers),
    )

    # ---- second round: SearchBySim3 (reference src/ORBmatcher.cc:1106) ----
    # project ALL of the loop keyframe's map points into the current image
    # through the solved Sim3 and window-match to grow the correspondence set
    from orb_slam2_aruco_tpu.geometry.lie import sim3_apply

    p2_all = se3_apply(
        state.kf_Rcw[kf_loop][None], state.kf_tcw[kf_loop][None],
        state.pt_xyz[jnp.maximum(loop_obs, 0)],
    )  # every loop feature's point in loop cam coords
    q = sim3_apply(res.s[None], res.R, res.t, p2_all)
    uv_pred = cam_mod.project(cam, q)
    loop_ok = mask_loop & state.pt_valid[jnp.maximum(loop_obs, 0)] & (
        q[:, 2] > 0.02
    )
    m2 = matching.match_in_window(
        state.kf_desc[kf_loop], state.kf_desc[kf_cur], uv_pred,
        state.kf_kp_uv[kf_cur],
        radius=7.5,
        mask_a=loop_ok, mask_b=mask_cur,
        max_dist=float(cfg.matcher.th_high), nn_ratio=1.0,
    )
    # merge into per-cur-feature correspondences (first round wins)
    Ncur = cur_obs.shape[0]
    tgt = jnp.where(m2.valid, m2.idx, Ncur)
    j2_of_cur = jnp.full((Ncur + 1,), -1, jnp.int32).at[tgt].max(
        jnp.where(m2.valid, jnp.arange(loop_obs.shape[0], dtype=jnp.int32), -1)
    )[:Ncur]
    j_merged = jnp.where(m.valid, m.idx, j2_of_cur)
    valid2 = (j_merged >= 0) & mask_cur
    jm = jnp.maximum(j_merged, 0)
    X2b = state.pt_xyz[jnp.maximum(loop_obs[jm], 0)]
    p2b = se3_apply(
        state.kf_Rcw[kf_loop][None], state.kf_tcw[kf_loop][None], X2b
    )
    valid2 = valid2 & state.pt_valid[jnp.maximum(cur_obs, 0)] & \
        state.pt_valid[jnp.maximum(loop_obs[jm], 0)]
    res2 = sim3_opt.optimize_sim3(
        res.s, res.R, res.t, p1, p2b, uv1,
        state.kf_kp_uv[kf_loop][jm], valid2, inv1,
        sig2[state.kf_kp_octave[kf_loop][jm]], cam,
        fix_scale=cfg.loop.fix_scale,
        iters_first=cfg.optim.sim3_iters,
        iters_second=2 * cfg.optim.sim3_iters,
    )
    use2 = res2.n_inliers >= res.n_inliers
    s_f = jnp.where(use2, res2.s, res.s)
    R_f = jnp.where(use2, res2.R, res.R)
    t_f = jnp.where(use2, res2.t, res.t)
    n_f = jnp.maximum(res2.n_inliers, res.n_inliers)

    # ---- 2D-3D verification (ComputeSim3ByAruco, LoopClosing.cc:440-476):
    # the reference collects the map points of the loop keyframe's WHOLE
    # covisible group, projects them through the candidate S_cur_w into the
    # current image (SearchByProjection, radius 10), and accepts the loop on
    # >= 30 descriptor-verified matches. Crucially, on the marker path the
    # RAW marker-seeded Sim3 is a valid final answer — point-optimization
    # consensus is never required (the marker is metric). We verify both the
    # marker seed and the point-refined transform and keep the better one.
    W = covisibility_matrix(state)
    K = state.K
    group = ((W[kf_loop] >= 15) | (jnp.arange(K) == kf_loop)) & state.kf_valid
    pt_group = (
        jnp.any(state.pt_obs_kf & group[None, :], axis=1) & state.pt_valid
    )
    R_loop_w = state.kf_Rcw[kf_loop]
    t_loop_w = state.kf_tcw[kf_loop]

    def proj_count(s_c, R_c, t_c):
        # S_cur_w = S_rel(cur<-loop) * T_loop_w
        sw, Rw, tw = sim3_compose(
            s_c, R_c, t_c, jnp.float32(1.0), R_loop_w, t_loop_w
        )
        q = sim3_apply(sw[None], Rw, tw, state.pt_xyz)
        uv_p = cam_mod.project(cam, q)
        mm = matching.match_in_window(
            state.pt_desc, state.kf_desc[kf_cur], uv_p,
            state.kf_kp_uv[kf_cur],
            radius=10.0,
            mask_a=pt_group & (q[:, 2] > 0.02),
            mask_b=state.kf_kp_valid[kf_cur],
            max_dist=float(cfg.matcher.th_low), nn_ratio=1.0,
        )
        return jnp.sum(mm.valid.astype(jnp.int32))

    n_proj_seed = proj_count(s0, R0, t0)
    n_proj_ref = proj_count(s_f, R_f, t_f)
    # prefer the refined transform when point consensus backs it; otherwise
    # fall back to whichever candidate the projection test likes better
    use_seed = (n_f < cfg.loop.sim3_min_inliers) & (n_proj_seed >= n_proj_ref)
    s_f = jnp.where(use_seed, s0, s_f)
    R_f = jnp.where(use_seed, R0, R_f)
    t_f = jnp.where(use_seed, t0, t_f)
    n_proj = jnp.maximum(n_proj_seed, n_proj_ref)
    import os
    if os.environ.get("SLAM_DEBUG_LOOP"):
        jax.debug.print(
            "SIM3DBG cur_pts={c} loop_pts={l} nn={n} r1a={a} r1b={b} r2={r2} "
            "nproj_seed={ps} nproj_ref={pr}",
            c=jnp.sum(mask_cur & state.pt_valid[jnp.maximum(cur_obs, 0)]),
            l=jnp.sum(mask_loop & state.pt_valid[jnp.maximum(loop_obs, 0)]),
            n=jnp.sum(valid), a=res_a.n_inliers, b=res_b.n_inliers,
            r2=res2.n_inliers, ps=n_proj_seed, pr=n_proj_ref,
        )
    ok = ok1 & ok2 & (
        (n_f >= cfg.loop.sim3_min_inliers)
        | (n_proj >= cfg.loop.proj_min_matches)
    )
    return Sim3Candidate(ok=ok, s=s_f, R=R_f, t=t_f,
                         n_inliers=jnp.maximum(n_f, n_proj))


def covis_edge_set(W, kf_valid, chain_j, loop_i, loop_j, loop_valid,
                   min_covis: int):
    """The FULL >=minFeat covisibility edge set of the essential graph
    (reference Optimizer.cc:1416-1440 adds EVERY pair with weight >= 100 via
    GetCovisiblesByWeight — no top-N truncation): dense K*K upper-triangle
    mask, minus pairs already present as spanning-tree or persistent loop
    edges (the reference's sInsertedEdges dedup). Returns (cov_i, cov_j,
    cov_mask) flat over the K*K grid."""
    K = kf_valid.shape[0]
    iu = jnp.arange(K, dtype=jnp.int32)
    cov_i = jnp.repeat(iu, K)
    cov_j = jnp.tile(iu, K)
    pair_w = W.reshape(-1)
    is_span = (chain_j[cov_i] == cov_j) | (chain_j[cov_j] == cov_i)
    LP = (
        jnp.zeros((K, K), bool)
        .at[loop_i, loop_j].max(loop_valid)
        .at[loop_j, loop_i].max(loop_valid)
    )
    cov_mask = (
        (cov_i < cov_j)
        & (pair_w >= min_covis)
        & kf_valid[cov_i]
        & kf_valid[cov_j]
        & ~is_span
        & ~LP.reshape(-1)
    )
    return cov_i, cov_j, cov_mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def correct_loop(
    state: MapState,
    kf_cur, kf_loop,
    s_rel, R_rel, t_rel,     # Sim3 cur <- loop (camera frames)
    cam: Camera,
    cfg: SlamConfig,
):
    """Propagate the loop correction and optimize the essential graph."""
    K = state.K
    W = covisibility_matrix(state)

    # ---- corrected Sim3 pose of the current KF: Scw = S_rel * S_loop_w ----
    s_loop = jnp.float32(1.0)
    R_loop = state.kf_Rcw[kf_loop]
    t_loop = state.kf_tcw[kf_loop]
    s_cur_c, R_cur_c, t_cur_c = sim3_compose(
        s_rel, R_rel, t_rel, s_loop, R_loop, t_loop
    )

    # ---- vertices: all KFs as Sim3 (s=1), cur replaced by corrected ------
    s_all = jnp.ones((K,), jnp.float32)
    R_all = state.kf_Rcw
    t_all = state.kf_tcw
    # propagate to covisible group of cur: S_k_corrected = S_k_cur * S_cur_c.
    # The LOOP keyframe is explicitly excluded: by correction time the
    # revisit's re-associations can have made it covisible with cur, but it
    # is the graph's FIXED gauge anchor (reference vScw: the matched KF
    # keeps its current pose, Optimizer.cc:1270-1310) — propagating it
    # would fix the whole graph at a displaced pose and tear the old map.
    covis_cur = (W[kf_cur] >= 15) & state.kf_valid
    covis_cur = covis_cur.at[kf_cur].set(True).at[kf_loop].set(False)
    Rcur_inv, tcur_inv = se3_inverse(state.kf_Rcw[kf_cur], state.kf_tcw[kf_cur])
    # S_k_cur (drifted relative): T_k_w * inv(T_cur_w)
    R_k_cur, t_k_cur = se3_compose(
        R_all, t_all,
        jnp.broadcast_to(Rcur_inv, R_all.shape),
        jnp.broadcast_to(tcur_inv, t_all.shape),
    )
    s_k_c, R_k_c, t_k_c = sim3_compose(
        jnp.ones((K,)), R_k_cur, t_k_cur,
        jnp.broadcast_to(s_cur_c, (K,)), jnp.broadcast_to(R_cur_c, (K, 3, 3)),
        jnp.broadcast_to(t_cur_c, (K, 3)),
    )
    s_init = jnp.where(covis_cur, s_k_c, s_all)
    R_init = jnp.where(covis_cur[:, None, None], R_k_c, R_all)
    t_init = jnp.where(covis_cur[:, None], t_k_c, t_all)

    # ---- point correction for the covisible group (pre-graph) ------------
    # X_new = S_k_corr^{-1} ( S_k_old X ) using each point's ref KF if that
    # ref is in the covisible group
    ref = jnp.clip(state.pt_ref_kf, 0, K - 1)
    in_group = covis_cur[ref] & (state.pt_ref_kf >= 0) & state.pt_valid
    Xc = se3_apply(R_all[ref], t_all[ref], state.pt_xyz)   # old cam coords
    si, Ri, ti = sim3_inverse(s_init[ref], R_init[ref], t_init[ref])
    X_new = si[:, None] * jnp.einsum("lij,lj->li", Ri, Xc) + ti
    pt_xyz = jnp.where(in_group[:, None], X_new, state.pt_xyz)

    # ---- essential graph edges -------------------------------------------
    # (a) covisibility SPANNING TREE (reference Optimizer.cc:1386-1420;
    # parent = best covisible among earlier keyframes, KeyFrame.cc:441-475).
    # An insertion-order chain is the wrong topology on revisits: temporally
    # adjacent but spatially distant keyframes would inject drifted relative
    # measurements as constraints. Keyframes with no earlier covisible
    # (disconnected segments, e.g. after relocalization) fall back to their
    # temporal predecessor so the graph stays connected.
    from orb_slam2_aruco_tpu.worldmap.covisibility import spanning_parent

    order_key = jnp.where(state.kf_valid, state.kf_seq, jnp.int32(2**30))
    parent = spanning_parent(W, state.kf_valid, order_key)        # [K]
    # temporal predecessor by insertion sequence (for parentless keyframes)
    earlier = (
        (order_key[None, :] < order_key[:, None]) & state.kf_valid[None, :]
    )
    pred_key = jnp.where(earlier, order_key[None, :], -1)
    pred = jnp.argmax(pred_key, axis=1).astype(jnp.int32)
    has_pred = jnp.max(pred_key, axis=1) >= 0
    chain_i = jnp.arange(K, dtype=jnp.int32)
    chain_j = jnp.where(parent >= 0, parent, pred)
    chain_mask = state.kf_valid & (parent >= 0) | (
        state.kf_valid & has_pred
    )
    # persistent loop-edge table, with the CURRENT pair appended ----------
    # (KeyFrame::AddLoopEdge, KeyFrame.cc:515-525: loops are permanent —
    # every stored pair re-enters every later essential-graph run,
    # Optimizer.cc:1390-1414)
    already = jnp.any(
        state.loop_valid
        & (((state.loop_i == kf_cur) & (state.loop_j == kf_loop))
           | ((state.loop_i == kf_loop) & (state.loop_j == kf_cur)))
    )
    e_free = jnp.argmin(state.loop_valid.astype(jnp.int32))
    do_add = (~already) & (~state.loop_valid[e_free])
    loop_i_t = state.loop_i.at[e_free].set(
        jnp.where(do_add, kf_cur.astype(jnp.int32), state.loop_i[e_free])
    )
    loop_j_t = state.loop_j.at[e_free].set(
        jnp.where(do_add, kf_loop.astype(jnp.int32), state.loop_j[e_free])
    )
    loop_valid_t = state.loop_valid.at[e_free].set(
        jnp.where(do_add, True, state.loop_valid[e_free])
    )
    li = jnp.clip(loop_i_t, 0, K - 1)
    lj = jnp.clip(loop_j_t, 0, K - 1)
    cov_i, cov_j, cov_mask = covis_edge_set(
        W, state.kf_valid, chain_j, li, lj, loop_valid_t,
        cfg.optim.essential_graph_min_covis,
    )
    # (c) all stored loop edges, plus one explicit row for the CURRENT loop
    # (the table row for the current pair, if any, is masked out so the
    # constraint enters exactly once — and still enters when the table is
    # full and the pair could not be stored)
    cur_row = (
        loop_valid_t
        & (((loop_i_t == kf_cur) & (loop_j_t == kf_loop))
           | ((loop_i_t == kf_loop) & (loop_j_t == kf_cur)))
    )
    e_i = jnp.concatenate(
        [chain_i, cov_i, li, jnp.atleast_1d(kf_cur).astype(jnp.int32)]
    )
    e_j = jnp.concatenate(
        [chain_j, cov_j, lj, jnp.atleast_1d(kf_loop).astype(jnp.int32)]
    )
    loop_edge_mask = (
        loop_valid_t & ~cur_row
        & state.kf_valid[li] & state.kf_valid[lj]
    )
    e_mask = jnp.concatenate(
        [chain_mask, cov_mask, loop_edge_mask, jnp.asarray([True])]
    ).astype(jnp.float32)

    # measurements for edge (i, j): the solver convention (see
    # optimize_pose_graph docstring + test_pose_graph_closes_loop) is
    # S_m = S_jw * S_wi — zero residual iff the optimized relative pose
    # matches the measured one. Chain/covis edges and PAST loop edges
    # measure from PRE-correction poses (past seams were corrected when
    # they closed, so the current relative pose IS the constraint — the
    # reference's vScw-based measurement, Optimizer.cc:1390); the newly
    # solved Sim3 constrains the current loop edge.
    def rel_meas(Ra, ta, Rb, tb):
        # S_jw * S_wi with s = 1  (edge (i=a, j=b))
        Rai, tai = se3_inverse(Ra, ta)
        R, t = se3_compose(Rb, tb, Rai, tai)
        return jnp.ones(R.shape[:-2]), R, t

    sm_c, Rm_c, tm_c = rel_meas(
        R_all[e_i[:-1]], t_all[e_i[:-1]], R_all[e_j[:-1]], t_all[e_j[:-1]]
    )
    # current loop edge (i=cur, j=loop): S_m = S_loop_w * inv(S_cur_w_corr)
    sl, Rl, tl = sim3_compose(
        jnp.float32(1.0), R_loop, t_loop,
        *sim3_inverse(s_cur_c, R_cur_c, t_cur_c),
    )
    sm = jnp.concatenate([sm_c, sl[None]])
    Rm = jnp.concatenate([Rm_c, Rl[None]])
    tm = jnp.concatenate([tm_c, tl[None]])
    import os as _os
    if _os.environ.get("SLAM_DEBUG_LOOP"):
        jax.debug.print(
            "EGDBG chain={c} cov={v} loop_rows={lr} cur_row={cr} "
            "li={li} lj={lj}",
            c=jnp.sum(chain_mask), v=jnp.sum(cov_mask),
            lr=jnp.sum(loop_edge_mask), cr=jnp.sum(cur_row),
            li=li, lj=lj,
        )

    free = state.kf_valid.astype(jnp.float32).at[kf_loop].set(0.0)
    out = pose_graph.optimize_pose_graph(
        s_init, R_init, t_init, e_i, e_j, sm, Rm, tm, e_mask, free,
        iters=cfg.optim.essential_graph_iters,
        lam=cfg.optim.lm_lambda_essential,
        fix_scale=cfg.loop.fix_scale,
    )

    # ---- recover SE3 (t / s) and re-transform points & markers -----------
    s_new = jnp.where(state.kf_valid, out.s, 1.0)
    R_new = jnp.where(state.kf_valid[:, None, None], out.R, R_all)
    t_new = jnp.where(state.kf_valid[:, None], out.t / jnp.maximum(s_new, 1e-9)[:, None], t_all)

    # points: X_new = T_w_ref_new * (s_ref_old_to_new adjusting) — transform
    # via each point's ref KF: X' = T_new^{-1}( S_old_sim3 X ) with the
    # pose-graph's Sim3 (reference RunGlobalBundleAdjustment point update)
    Xc2 = (
        s_init[ref][:, None] * jnp.einsum("lij,lj->li", R_init[ref], pt_xyz)
        + t_init[ref]
    )  # sim3_apply with the pre-graph vertex estimates
    si2, Ri2, ti2 = sim3_inverse(out.s[ref], out.R[ref], out.t[ref])
    X2 = si2[:, None] * jnp.einsum("lij,lj->li", Ri2, Xc2) + ti2
    move = state.pt_valid & (state.pt_ref_kf >= 0)
    pt_xyz = jnp.where(move[:, None], X2, pt_xyz)

    # markers: re-anchor Twm from the corrected pose of an observing KF
    # (reference CorrectLoopByAruco:781-798 + MapAruco.cc:84-101:
    # Twm = T_w_k(corrected) * T_k_m(stored observation), with the observer
    # taken from the CORRECTED covisible group). Observer choice prefers
    # the corrected group and, within it, the least ambiguous stored
    # detection; the IPPE solution is then chosen by consistency with the
    # marker's prior pose rather than unconditionally taking solution 0 —
    # an ambiguous near-frontal view must not flip the marker's normal for
    # all later tracking.
    M = state.M
    A = state.kf_mk_slot.shape[1]
    obs_mask = (
        state.kf_mk_valid
        & (state.kf_mk_slot >= 0)
        & state.kf_valid[:, None]
    )
    uv_all = state.kf_mk_uv.reshape(K * A, 4, 2)
    xn_all = cam_mod.pixels_to_normalized(cam, uv_all)
    ippe_all = ippe_square(jnp.float32(1.0), xn_all)  # unit side: t scales
    ratio_all = ippe_all.ratio                         # err0/err1 ambiguity
    # score per observation: corrected-group membership dominates, then the
    # sharper (less ambiguous) detection wins
    score = covis_cur[:, None].astype(jnp.float32) * 10.0 - jnp.reshape(
        ratio_all, (K, A)
    )
    flat_slot = jnp.where(obs_mask, state.kf_mk_slot, M).reshape(-1)
    slots_eq = flat_slot[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :]
    sc = jnp.where(slots_eq, score.reshape(-1)[:, None], -jnp.inf)  # [KA, M]
    best_idx = jnp.argmax(sc, axis=0)                  # [M]
    has_obs = jnp.any(slots_eq, axis=0)
    kf_of = jnp.clip(best_idx // A, 0, K - 1)
    R2 = ippe_all.R[best_idx]                          # [M, 2, 3, 3]
    t2 = ippe_all.t[best_idx] * state.mk_side[:, None, None]
    # expected T_k_m from the marker's (self-consistent, pre-correction)
    # state: T_k_w_old * T_w_m_old
    R_exp, t_exp = se3_compose(
        R_all[kf_of], t_all[kf_of], state.mk_Rwm, state.mk_twm
    )
    tr0 = jnp.einsum("mij,mij->m", R2[:, 0], R_exp)
    tr1 = jnp.einsum("mij,mij->m", R2[:, 1], R_exp)
    amb = ratio_all[best_idx] >= cfg.aruco.ippe_ambiguity_ratio
    pick1 = amb & (tr1 > tr0)
    Rk_m = jnp.where(pick1[:, None, None], R2[:, 1], R2[:, 0])
    tk_m = jnp.where(pick1[:, None], t2[:, 1], t2[:, 0])
    Rw_k, tw_k = se3_inverse(R_new[kf_of], t_new[kf_of])
    Rwm_new, twm_new = se3_compose(Rw_k, tw_k, Rk_m, tk_m)
    upd = state.mk_valid & has_obs
    mk_Rwm = jnp.where(upd[:, None, None], Rwm_new, state.mk_Rwm)
    mk_twm = jnp.where(upd[:, None], twm_new, state.mk_twm)

    state = state._replace(
        kf_Rcw=R_new,
        kf_tcw=t_new,
        pt_xyz=pt_xyz,
        mk_Rwm=mk_Rwm,
        mk_twm=mk_twm,
        kf_mk_old=jnp.zeros_like(state.kf_mk_old),
        loop_i=loop_i_t,
        loop_j=loop_j_t,
        loop_valid=loop_valid_t,
        big_change_idx=state.big_change_idx + 1,
    )
    return state, out.chi2


@functools.partial(jax.jit, static_argnames=())
def covis_weight(state: MapState, kf_a, kf_b):
    """Shared-point count between two keyframes (for host-side consistency
    grouping)."""
    W = covisibility_matrix(state)
    return W[kf_a, kf_b]


@functools.partial(jax.jit, static_argnames=())
def covis_row(state: MapState, kf):
    """One keyframe's covisibility weights against every keyframe — shared
    valid-point counts via the [L, K] incidence, WITHOUT forming the full
    K x K matrix (the ConsistencyTracker needs a handful of entries per
    candidate, not a K x L x K matmul per membership query)."""
    row = state.pt_obs_kf[:, kf] & state.pt_valid            # [L]
    inc = state.pt_obs_kf & state.kf_valid[None, :]          # [L, K]
    return jnp.dot(
        row.astype(jnp.float32), inc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


class ConsistencyTracker:
    """Host-side 3-consecutive-consistency gate for BoW loop candidates
    (reference DetectLoop consistency groups, src/LoopClosing.cc:260-319):
    a candidate is accepted only after candidates consistent with it (same
    keyframe or covisible) appeared in `threshold` consecutive detections."""

    def __init__(self, threshold: int = 3):
        self.threshold = threshold
        self.prev: list = []  # list of (kf_slot, count)

    def update(self, state: MapState, cand_kf: int) -> bool:
        import numpy as _np

        new_prev = []
        accepted = False
        matched = False
        # ONE covisibility-row dispatch per candidate; every previous-group
        # membership query reads from it
        row = (
            _np.asarray(covis_row(state, jnp.asarray(cand_kf)))
            if self.prev else None
        )
        for kf_old, count in self.prev:
            consistent = kf_old == cand_kf or int(row[kf_old]) >= 15
            if consistent:
                matched = True
                new_prev.append((cand_kf, count + 1))
                if count + 1 >= self.threshold:
                    accepted = True
        if not matched:
            new_prev.append((cand_kf, 1))
            if self.threshold <= 1:
                accepted = True
        self.prev = new_prev
        return accepted

    def reset(self):
        self.prev = []


@functools.partial(jax.jit, static_argnames=("min_gap",))
def detect_loop_by_bow(state: MapState, kf_cur, min_gap: int = 10):
    """Appearance-based loop candidates (DetectLoop, reference
    src/LoopClosing.cc:191-360): best-scoring old keyframe by retrieval
    signature, excluding the covisible neighborhood; the acceptance score
    floor is the minimum score against current covisibles (minScore)."""
    from orb_slam2_aruco_tpu.worldmap import retrieval

    K = state.K
    W = covisibility_matrix(state)
    covis = (W[kf_cur] >= 15) & state.kf_valid
    covis = covis.at[kf_cur].set(True)
    # minScore: lowest similarity among covisible keyframes
    scores_covis = jnp.dot(state.kf_bow, state.kf_bow[kf_cur])
    min_score = jnp.min(
        jnp.where(covis & (jnp.arange(K) != kf_cur), scores_covis, 1.0)
    )
    # rank gap (insertion order)
    order_rank = jnp.sum(
        (state.kf_frame_id[:, None] > state.kf_frame_id[None, :])
        & state.kf_valid[None, :],
        axis=1,
    )
    too_young = (order_rank[kf_cur] - order_rank) < min_gap
    exclude = covis | ~state.kf_valid | too_young
    idx, vals, keep = retrieval.detect_candidates_grouped(
        state.kf_bow[kf_cur], state.kf_bow, state.kf_valid,
        covis_w=W.astype(jnp.float32),
        exclude_mask=exclude, min_score=min_score, max_candidates=4,
    )
    found = keep[0]
    return LoopDetection(
        found=found,
        kf_loop=jnp.where(found, idx[0], -1).astype(jnp.int32),
        marker_slot=jnp.asarray(-1, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("min_gap",))
def detect_loops(state: MapState, kf_cur, min_gap: int = 10):
    """Marker-id + BoW loop detection as ONE device program: the tracking
    loop dispatches both every eligible keyframe insert (sync-free, flags
    read back a frame later), and fusing them lets XLA compute the shared
    covisibility matrix once."""
    return (
        detect_loop_by_marker(state, kf_cur, min_gap=min_gap),
        detect_loop_by_bow(state, kf_cur, min_gap=min_gap),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "num_hypotheses"))
def compute_sim3_classic(state: MapState, kf_cur, kf_loop,
                         cam: Camera, cfg: SlamConfig,
                         num_hypotheses: int = 128) -> Sim3Candidate:
    """Classic Sim3 path (ComputeSim3, reference src/LoopClosing.cc:485-654):
    Horn closed-form on RANSAC triples of matched 3D-3D pairs — every
    hypothesis evaluated in one batch — then sim3_opt refinement."""
    from orb_slam2_aruco_tpu.geometry.horn import horn_sim3

    cur_obs = state.kf_obs_point[kf_cur]
    loop_obs = state.kf_obs_point[kf_loop]
    mask_cur = state.kf_kp_valid[kf_cur] & (cur_obs >= 0)
    mask_loop = state.kf_kp_valid[kf_loop] & (loop_obs >= 0)
    d = matching.distance_matrix(
        state.kf_desc[kf_cur], state.kf_desc[kf_loop], mask_cur, mask_loop
    )
    m = matching.nn_match(d, max_dist=float(cfg.matcher.th_low), nn_ratio=0.9,
                          mutual=True)
    X1 = state.pt_xyz[jnp.maximum(cur_obs, 0)]
    p1 = se3_apply(state.kf_Rcw[kf_cur][None], state.kf_tcw[kf_cur][None], X1)
    j = jnp.maximum(m.idx, 0)
    X2 = state.pt_xyz[jnp.maximum(loop_obs[j], 0)]
    p2 = se3_apply(state.kf_Rcw[kf_loop][None], state.kf_tcw[kf_loop][None], X2)
    valid = m.valid & mask_cur & state.pt_valid[jnp.maximum(cur_obs, 0)] & \
        state.pt_valid[jnp.maximum(loop_obs[j], 0)]

    N = p1.shape[0]
    key = jax.random.PRNGKey(1)
    w = valid.astype(jnp.float32)
    prob = w / jnp.maximum(jnp.sum(w), 1.0)
    sets = jax.random.choice(key, N, shape=(num_hypotheses, 3), replace=True,
                             p=prob)
    s_h, R_h, t_h = horn_sim3(
        p2[sets], p1[sets], fix_scale=cfg.loop.fix_scale
    )  # maps loop-frame points into cur frame
    # score by image-space transfer into the current keyframe
    q1 = s_h[:, None, None] * jnp.einsum("hij,nj->hni", R_h, p2) + t_h[:, None]
    uv_pred = cam_mod.project(cam, q1)
    uv1 = state.kf_kp_uv[kf_cur]
    err = jnp.sum((uv_pred - uv1[None]) ** 2, axis=-1)
    ok_pt = (err < 9.21) & (q1[..., 2] > 0.02) & valid[None]
    scores = jnp.sum(ok_pt.astype(jnp.int32), axis=1)
    b = jnp.argmax(scores)

    sig2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)
    inv1 = sig2[state.kf_kp_octave[kf_cur]]
    inv2 = sig2[state.kf_kp_octave[kf_loop][j]]
    res = sim3_opt.optimize_sim3(
        s_h[b], R_h[b], t_h[b], p1, p2, uv1,
        state.kf_kp_uv[kf_loop][j], valid, inv1, inv2, cam,
        fix_scale=cfg.loop.fix_scale,
        iters_first=cfg.optim.sim3_iters,
        iters_second=2 * cfg.optim.sim3_iters,
    )
    ok = (
        (scores[b] >= cfg.loop.sim3_min_inliers_classic)
        & (res.n_inliers >= cfg.loop.sim3_min_inliers_classic)
    )
    return Sim3Candidate(ok=ok, s=res.s, R=res.R, t=res.t,
                         n_inliers=res.n_inliers)
