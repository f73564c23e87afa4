"""Map maintenance: keyframe insertion, initialization, triangulation,
point culling, local/global BA.

Replaces LocalMapping (reference src/LocalMapping.cc) + the map-building
parts of Tracking (CreateInitialMapMonocular, Tracking.cc:690-819;
CreateNewKeyFrame, :1394-1460). The mapping 'thread' becomes sequential
jitted steps invoked by the System loop after each keyframe insertion
(SURVEY.md §5: thread pipeline -> phases of one program).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import (
    se3_apply,
    se3_compose,
    se3_inverse,
)
from orb_slam2_aruco_tpu.geometry.triangulate import triangulate_dlt
from orb_slam2_aruco_tpu.ops import matching
from orb_slam2_aruco_tpu.optim import ba
from orb_slam2_aruco_tpu.pipeline.frontend import Frame, scale_sigma2
from orb_slam2_aruco_tpu.worldmap.state import MapState, first_free_slot, free_slots


def _scale_factors(cfg: SlamConfig):
    return jnp.asarray(
        [cfg.orb.scale_factor**l for l in range(cfg.orb.num_levels)],
        dtype=jnp.float32,
    )


# ---------------------------------------------------------------------------
# keyframe insertion
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def create_keyframe(
    state: MapState,
    frame: Frame,
    Rcw, tcw,
    obs_point,             # [N] current associations
    slots,                 # [A] marker-slot binding (-1 = not in map yet)
    frame_id, ts,
    cam: Camera,
    cfg: SlamConfig,
    mk_old=None,           # [A] mvbOldAruco flags at observation time
    slot=None,             # keyframe slot (host-allocated); None = on-device
                           # first-free search (forces the caller to read k
                           # back — the pipelined host loop passes the slot
                           # from its occupancy mirror to stay sync-free)
):
    """Insert the frame as a keyframe; create MapAruco entries for new good
    markers (reference CreateNewKeyFrame, Tracking.cc:1394-1460: new good
    marker => MapAruco with Twm = Twc * Tcm)."""
    k = first_free_slot(state.kf_valid) if slot is None else jnp.asarray(
        slot, jnp.int32
    )
    A = slots.shape[0]
    # new markers: good, valid, not bound
    new_mk = frame.mk_valid & frame.mk_good & (slots < 0)
    mk_free = free_slots(state.mk_valid, A)     # [A] candidate slots
    new_rank = jnp.cumsum(new_mk.astype(jnp.int32)) - 1
    can_alloc = new_mk & (new_rank < A) & ~state.mk_valid[mk_free[jnp.clip(new_rank, 0, A - 1)]]
    alloc_slot = mk_free[jnp.clip(new_rank, 0, A - 1)]
    final_slot = jnp.where(can_alloc, alloc_slot, slots)  # [A] (-1 if neither)

    # marker world pose for new markers: Twm = Twc * Tcm
    Rwc, twc = se3_inverse(Rcw, tcw)
    Rwm_new, twm_new = se3_compose(
        jnp.broadcast_to(Rwc, frame.mk_Rcm.shape),
        jnp.broadcast_to(twc, frame.mk_tcm.shape),
        frame.mk_Rcm, frame.mk_tcm,
    )
    mk_Rwm = state.mk_Rwm
    mk_twm = state.mk_twm
    mk_id = state.mk_id
    mk_valid = state.mk_valid
    tgt = jnp.where(can_alloc, alloc_slot, state.M)  # dump invalid past end
    mk_Rwm = jnp.concatenate([mk_Rwm, jnp.zeros((1, 3, 3), mk_Rwm.dtype)]).at[
        tgt
    ].set(Rwm_new)[: state.M]
    mk_twm = jnp.concatenate([mk_twm, jnp.zeros((1, 3), mk_twm.dtype)]).at[tgt].set(
        twm_new
    )[: state.M]
    mk_id = jnp.concatenate([mk_id, jnp.zeros((1,), mk_id.dtype)]).at[tgt].set(
        frame.mk_ids
    )[: state.M]
    mk_valid = jnp.concatenate([mk_valid, jnp.zeros((1,), bool)]).at[tgt].set(
        can_alloc
    )[: state.M]

    state = state._replace(
        kf_Rcw=state.kf_Rcw.at[k].set(Rcw),
        kf_tcw=state.kf_tcw.at[k].set(tcw),
        kf_valid=state.kf_valid.at[k].set(True),
        kf_frame_id=state.kf_frame_id.at[k].set(frame_id),
        kf_ts=state.kf_ts.at[k].set(ts),
        kf_seq=state.kf_seq.at[k].set(state.next_seq),
        next_seq=state.next_seq + 1,
        kf_kp_uv=state.kf_kp_uv.at[k].set(frame.kp_uv),
        kf_kp_octave=state.kf_kp_octave.at[k].set(frame.kp_octave),
        kf_kp_angle=state.kf_kp_angle.at[k].set(frame.kp_angle),
        kf_desc=state.kf_desc.at[k].set(frame.desc),
        kf_kp_valid=state.kf_kp_valid.at[k].set(frame.kp_valid),
        kf_obs_point=state.kf_obs_point.at[k].set(obs_point),
        # point<->KF incidence column for this (possibly reused) KF slot
        pt_obs_kf=state.pt_obs_kf.at[:, k].set(
            jnp.zeros((state.L,), bool)
            .at[jnp.clip(obs_point, 0, state.L - 1)]
            .max(obs_point >= 0)
        ),
        mk_Rwm=mk_Rwm,
        mk_twm=mk_twm,
        mk_id=mk_id,
        mk_valid=mk_valid,
        kf_mk_slot=state.kf_mk_slot.at[k].set(final_slot),
        kf_mk_uv=state.kf_mk_uv.at[k].set(frame.mk_corners),
        kf_mk_valid=state.kf_mk_valid.at[k].set(
            frame.mk_valid & (final_slot >= 0)
        ),
        kf_mk_old=state.kf_mk_old.at[k].set(
            jnp.zeros_like(final_slot, dtype=bool) if mk_old is None else mk_old
        ),
        kf_bow=state.kf_bow.at[k].set(frame.bow),
    )
    return state, k


# ---------------------------------------------------------------------------
# triangulation of new map points
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def triangulate_new_points(
    state: MapState,
    kf_new, kf_prev,
    cam: Camera,
    cfg: SlamConfig,
    max_new: int = 256,
):
    """Two-view triangulation between a new keyframe and one neighbor
    (CreateNewMapPoints, reference src/LocalMapping.cc:222-467): match
    features without map points, epipolar-gate, DLT, cheirality/reproj/
    scale gates, allocate point slots."""
    return _triangulate_pair(state, kf_new, kf_prev, cam, cfg, max_new,
                             enable=jnp.asarray(True))


def _triangulate_pair(
    state: MapState,
    kf_new, kf_prev,
    cam: Camera,
    cfg: SlamConfig,
    max_new: int,
    enable,
):
    """Traced body of two-view triangulation; `enable` (traced bool) masks
    the whole allocation so a caller can loop over a fixed neighbor list
    with invalid tail entries. Thin composition of the shared candidate
    generator (_tri_candidates) and allocator (_allocate_points) — one copy
    of the epipolar/DLT/gate logic serves both this single-pair entry and
    triangulate_vs_covisible."""
    good, xyz, prev_idx, _ = _tri_candidates(
        state, kf_new, kf_prev, cam, cfg, enable
    )
    N = good.shape[0]
    nb_slot = jnp.broadcast_to(
        jnp.asarray(kf_prev, jnp.int32), (N,)
    )
    return _allocate_points(
        state, kf_new, nb_slot, prev_idx, good, xyz, cam, cfg, max_new
    )


def _tri_candidates(state: MapState, kf_new, nb, cam: Camera,
                    cfg: SlamConfig, enable):
    """Per-neighbor triangulation candidates (the match + DLT + gate half of
    the reference's CreateNewMapPoints, src/LocalMapping.cc:222-467) WITHOUT
    any state writes, so a vmap over neighbors evaluates every covisible
    pair in one wide batch. Returns (good [N], xyz [N, 3], prev_idx [N],
    cos_parallax [N]) indexed by the new keyframe's features."""
    N = state.kf_kp_uv.shape[1]
    d_new = state.kf_desc[kf_new]
    d_prev = state.kf_desc[nb]
    free_new = state.kf_kp_valid[kf_new] & (state.kf_obs_point[kf_new] < 0)
    free_prev = state.kf_kp_valid[nb] & (state.kf_obs_point[nb] < 0)
    dist = matching.distance_matrix(d_new, d_prev, free_new, free_prev)
    R1 = state.kf_Rcw[nb]
    t1 = state.kf_tcw[nb]
    R2 = state.kf_Rcw[kf_new]
    t2 = state.kf_tcw[kf_new]
    # epipolar gate BEFORE nearest-neighbor selection (the reference's
    # CheckDistEpipolarLine inside SearchForTriangulation,
    # src/ORBmatcher.cc:140-157 and :661): repetitive texture makes pure
    # descriptor-NN matching ambiguous; the epipolar constraint resolves it
    R21, t21 = se3_compose(R2, t2, *se3_inverse(R1, t1))
    tx, ty, tz = t21[0], t21[1], t21[2]
    zero = jnp.zeros(())
    skew = jnp.stack([
        jnp.stack([zero, -tz, ty]),
        jnp.stack([tz, zero, -tx]),
        jnp.stack([-ty, tx, zero]),
    ])
    E = skew @ R21                                               # [t]x R
    Kinv = jnp.asarray([
        [1.0 / cam.fx, 0.0, -cam.cx / cam.fx],
        [0.0, 1.0 / cam.fy, -cam.cy / cam.fy],
        [0.0, 0.0, 1.0],
    ], dtype=jnp.float32)
    F = Kinv.T @ E @ Kinv
    uv1_all = state.kf_kp_uv[nb]
    uv2_all = state.kf_kp_uv[kf_new]
    p1h = jnp.concatenate([uv1_all, jnp.ones((N, 1))], axis=1)   # [N, 3]
    p2h = jnp.concatenate([uv2_all, jnp.ones((N, 1))], axis=1)
    lines = p1h @ F.T                                            # [N_prev, 3]
    num = jnp.abs(p2h @ lines.T)                                 # [new, prev]
    den = jnp.sqrt(lines[:, 0] ** 2 + lines[:, 1] ** 2)[None, :]
    epi_d2 = (num / jnp.maximum(den, 1e-9)) ** 2
    sig2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)
    epi_ok = epi_d2 * sig2[state.kf_kp_octave[kf_new]][:, None] < 3.84
    dist = jnp.where(epi_ok, dist, jnp.inf)
    m = matching.nn_match(
        dist, max_dist=float(cfg.matcher.th_low),
        nn_ratio=0.8, mutual=True,
    )
    uv_new = uv2_all
    uv_prev = uv1_all[jnp.maximum(m.idx, 0)]
    xn2 = cam_mod.pixels_to_normalized(cam, uv_new)
    xn1 = cam_mod.pixels_to_normalized(cam, uv_prev)
    Nb = xn1.shape[0]
    xyz = triangulate_dlt(
        jnp.broadcast_to(R1, (Nb, 3, 3)), jnp.broadcast_to(t1, (Nb, 3)),
        jnp.broadcast_to(R2, (Nb, 3, 3)), jnp.broadcast_to(t2, (Nb, 3)),
        xn1, xn2,
    )
    z1 = se3_apply(R1[None], t1[None], xyz)[..., 2]
    p2 = se3_apply(R2[None], t2[None], xyz)
    z2 = p2[..., 2]
    uv1_re = cam_mod.project(cam, se3_apply(R1[None], t1[None], xyz))
    uv2_re = cam_mod.project(cam, p2)
    e1 = jnp.sum((uv1_re - uv_prev) ** 2, axis=-1)
    e2 = jnp.sum((uv2_re - uv_new) ** 2, axis=-1)
    s2_new = sig2[state.kf_kp_octave[kf_new]]
    # parallax: rays from the two camera centers
    _, c1 = se3_inverse(R1, t1)
    _, c2 = se3_inverse(R2, t2)
    r1 = xyz - c1[None]
    r2v = xyz - c2[None]
    cosp = jnp.sum(r1 * r2v, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2v, axis=-1), 1e-9
    )
    good = (
        m.valid
        & enable
        & jnp.all(jnp.isfinite(xyz), axis=-1)
        & (z1 > 0.02)
        & (z2 > 0.02)
        & (e1 * s2_new < 5.991)
        & (e2 * s2_new < 5.991)
        & (cosp < 0.9999)
    )
    return good, xyz, jnp.maximum(m.idx, 0), cosp


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_neighbors", "max_new")
)
def triangulate_vs_covisible(
    state: MapState,
    kf_new,
    cam: Camera,
    cfg: SlamConfig,
    n_neighbors: int = 20,
    max_new: int = 256,
):
    """Triangulate the new keyframe against its top-N covisible neighbors in
    ONE device program (reference CreateNewMapPoints takes the top-20
    covisible keyframes for mono, src/LocalMapping.cc:222-229, and skips
    neighbors whose baseline is < 1% of their scene depth, :248-260 — the
    reference uses the median scene depth; the mean is used here as a cheap,
    jit-friendly proxy).

    TPU-shape: every neighbor pair's match + DLT + gates run as one vmapped
    batch (no sequential per-pair passes); each free feature of the new
    keyframe then picks its best-parallax surviving candidate and a single
    allocation pass creates the points. Unlike the reference's sequential
    pair loop this also dedups a feature matched in several neighbors at
    creation time instead of relying on later fusion.

    Returns (state, n_created_total)."""
    # covisibility ranking: shared valid map points with every keyframe
    row_new = state.pt_obs_kf[:, kf_new] & state.pt_valid        # [L]
    inc = state.pt_obs_kf & state.kf_valid[None, :]              # [L, K]
    share = jnp.dot(
        row_new.astype(jnp.float32), inc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )                                                            # [K]
    K = state.K
    N = state.kf_kp_uv.shape[1]
    kiota = jnp.arange(K, dtype=jnp.int32)
    share = jnp.where((kiota == kf_new) | ~state.kf_valid, 0.0, share)
    # baseline / scene-depth gate per neighbor
    _, c_new = se3_inverse(state.kf_Rcw[kf_new], state.kf_tcw[kf_new])
    _, c_all = se3_inverse(state.kf_Rcw, state.kf_tcw)           # [K, 3]
    baseline = jnp.linalg.norm(c_all - c_new[None], axis=-1)     # [K]
    # mean depth of each keyframe's observed points in its camera frame
    z_all = jnp.einsum(
        "kj,lj->lk", state.kf_Rcw[:, 2, :], state.pt_xyz
    ) + state.kf_tcw[None, :, 2]                                 # [L, K]
    obs_v = inc & state.pt_valid[:, None]
    depth_sum = jnp.sum(jnp.where(obs_v, z_all, 0.0), axis=0)
    depth_cnt = jnp.maximum(jnp.sum(obs_v.astype(jnp.float32), axis=0), 1.0)
    mean_depth = depth_sum / depth_cnt
    ratio_ok = baseline / jnp.maximum(mean_depth, 1e-6) > 0.01
    share = jnp.where(ratio_ok, share, 0.0)
    top_w, top_idx = jax.lax.top_k(share, min(n_neighbors, K))

    good_n, xyz_n, prev_n, cosp_n = jax.vmap(
        lambda nb, en: _tri_candidates(state, kf_new, nb, cam, cfg, en)
    )(top_idx, top_w > 0)            # [n, N], [n, N, 3], [n, N], [n, N]

    # each new-KF feature picks its best-parallax surviving candidate
    score = jnp.where(good_n, -cosp_n, -jnp.inf)                 # [n, N]
    choice = jnp.argmax(score, axis=0)                           # [N]
    good = jnp.any(good_n, axis=0)                               # [N]
    take = lambda arr: jnp.take_along_axis(arr, choice[None], axis=0)[0]
    xyz = jnp.take_along_axis(
        xyz_n, choice[None, :, None].repeat(3, axis=-1), axis=0
    )[0]                                                         # [N, 3]
    prev_idx = take(prev_n)                                      # [N]
    nb_slot = top_idx[choice]                                    # [N]

    return _allocate_points(
        state, kf_new, nb_slot, prev_idx, good, xyz, cam, cfg, max_new
    )


def _allocate_points(state: MapState, kf_new, nb_slot, prev_idx, good, xyz,
                     cam: Camera, cfg: SlamConfig, max_new: int):
    """Single allocation pass for chosen triangulation candidates: slot
    assignment, stale-reference scrub, point attributes, observation rows
    (the state-write half of the reference's CreateNewMapPoints)."""
    N = good.shape[0]
    K = state.K
    rank = jnp.cumsum(good.astype(jnp.int32)) - 1
    slots_free = free_slots(state.pt_valid, max_new)
    can = good & (rank < max_new)
    pslot = slots_free[jnp.clip(rank, 0, max_new - 1)]
    can = can & ~state.pt_valid[pslot]
    tgt = jnp.where(can, pslot, state.L)
    # recycling safety net: clear any stale feature->point reference to the
    # slots being (re-)allocated, across ALL keyframes (cull_points scrubs
    # at invalidation time; this covers references invalidated since)
    recycled = jnp.zeros((state.L,), bool).at[tgt].set(can, mode="drop")
    obs_all = state.kf_obs_point
    stale_all = (obs_all >= 0) & recycled[jnp.maximum(obs_all, 0)]
    state = state._replace(kf_obs_point=jnp.where(stale_all, -1, obs_all))

    # point attributes (anchored at the new keyframe's view)
    _, c2 = se3_inverse(state.kf_Rcw[kf_new], state.kf_tcw[kf_new])
    view = xyz - c2[None]
    vdist = jnp.linalg.norm(view, axis=-1)
    normal = view / jnp.maximum(vdist[..., None], 1e-9)
    sf = _scale_factors(cfg)
    lvl = state.kf_kp_octave[kf_new]
    max_d = vdist * sf[lvl]
    min_d = max_d / sf[-1]
    d_new = state.kf_desc[kf_new]

    def scat(arr, vals):
        pad = jnp.zeros((1,) + arr.shape[1:], arr.dtype)
        return jnp.concatenate([arr, pad]).at[tgt].set(vals)[: state.L]

    state = state._replace(
        pt_xyz=scat(state.pt_xyz, xyz),
        pt_valid=scat(state.pt_valid, can),
        pt_desc=scat(state.pt_desc, d_new),
        pt_normal=scat(state.pt_normal, normal),
        pt_min_dist=scat(state.pt_min_dist, min_d),
        pt_max_dist=scat(state.pt_max_dist, max_d),
        pt_ref_kf=scat(state.pt_ref_kf, jnp.full((N,), 1, jnp.int32) * kf_new),
        # creation stamp = the creating keyframe's INSERTION SEQUENCE (see
        # cull_points / fuse_duplicates ordering under slot recycling)
        pt_first_kf=scat(
            state.pt_first_kf,
            jnp.broadcast_to(state.kf_seq[kf_new], (N,)).astype(jnp.int32),
        ),
        pt_found=scat(state.pt_found, jnp.ones((N,))),
        pt_visible=scat(state.pt_visible, jnp.ones((N,))),
        # recycled slots must not inherit the previous occupant's marker tag
        pt_aruco=scat(state.pt_aruco, jnp.full((N,), -1, jnp.int32)),
    )
    # observations: the new keyframe's feature row...
    obs_new = jnp.where(can, pslot, state.kf_obs_point[kf_new])
    state = state._replace(
        kf_obs_point=state.kf_obs_point.at[kf_new].set(obs_new)
    )
    # ...and each chosen neighbor's matched feature (flat 2-D scatter over
    # [neighbor slot, neighbor feature]; rows differ per candidate)
    nb_safe = jnp.where(can, nb_slot, K)
    state = state._replace(
        kf_obs_point=jnp.concatenate(
            [state.kf_obs_point, jnp.zeros((1, N), jnp.int32)]
        ).at[nb_safe, prev_idx].max(
            jnp.where(can, pslot, -1), mode="drop"
        )[:K]
    )
    # incidence rows for the new slots: observed by {kf_new, neighbor}; the
    # row overwrite also clears stale bits left by a culled previous occupant
    kiota = jnp.arange(K, dtype=jnp.int32)
    inc_rows = (kiota[None, :] == kf_new) | (
        kiota[None, :] == nb_slot[:, None]
    )                                                            # [N, K]
    pt_obs_kf = jnp.concatenate(
        [state.pt_obs_kf, jnp.zeros((1, K), bool)]
    ).at[tgt].set(inc_rows)[: state.L]
    state = state._replace(pt_obs_kf=pt_obs_kf)
    return state, jnp.sum(can.astype(jnp.int32))


# ---------------------------------------------------------------------------
# point culling
# ---------------------------------------------------------------------------


@jax.jit
def cull_points(state: MapState, min_found_ratio: float = 0.25):
    """MapPointCulling (reference src/LocalMapping.cc:185-220): drop RECENT
    points whose found/visible ratio is poor or that gathered too few
    keyframe observations. Crucially the reference applies both rules only
    while a point sits in the recently-added list (age <= 3 keyframes since
    creation); a point that survives its probation is never culled here —
    established map regions must stay intact for loop-closure matching.

    Age is measured in INSERTION SEQUENCE numbers (pt_first_kf holds the
    creating keyframe's kf_seq), so it stays correct when keyframe slots are
    recycled by culling on capacity-bound long sequences.

    Marker-correlated points (pt_aruco, the reference's forflag/mArucoID
    tag) get NO exemption here: the reference's MapPointCulling likewise
    applies no forflag check (LocalMapping.cc:185-220), and an experiment
    exempting them measurably degraded loop-closure accuracy (bad in-quad
    triangulations kept alive distort the loop Sim3) — marker protection
    lives at the KEYFRAME level (cull_keyframes), as in the reference."""
    ratio = state.pt_found / jnp.maximum(state.pt_visible, 1.0)
    cnt = jnp.sum(
        state.pt_obs_kf & state.kf_valid[None, :], axis=1, dtype=jnp.int32
    )
    latest_seq = state.next_seq - 1
    age = latest_seq - jnp.maximum(state.pt_first_kf, 0)
    recent = age <= 3
    bad = state.pt_valid & recent & (
        (ratio < min_found_ratio) | ((age >= 2) & (cnt <= 2))
    )
    new_valid = state.pt_valid & ~bad
    # scrub feature->point references to now-invalid slots: point slots are
    # RECYCLED by triangulate_new_points, and a stale kf_obs_point entry
    # would silently attach the old observations to the slot's next occupant
    # (corrupting BA edges, normals, and descriptor selection)
    obs = state.kf_obs_point
    stale = (obs >= 0) & ~new_valid[jnp.maximum(obs, 0)]
    return state._replace(
        pt_valid=new_valid,
        kf_obs_point=jnp.where(stale, -1, obs),
    ), jnp.sum(bad.astype(jnp.int32))


# ---------------------------------------------------------------------------
# local / global bundle adjustment over the map state
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_cams", "max_pts", "window_all", "max_fixed"),
)
def build_ba_problem(
    state: MapState,
    center_kf,
    cfg: SlamConfig,
    max_cams: int = 16,
    max_pts: int = 4096,
    window_all: bool = False,
    max_fixed: int = 0,
    pt_offset=0,
):
    """Window selection + edge-list construction for bundle adjustment
    (the problem-building half of LocalBundleAdjustment/GlobalBA). Returns
    (prob, sel, sel_ok, pt_sel, pt_ok) so the solve can run locally
    (optim.ba.ba_solve) or sharded over a device mesh
    (parallel.dist_ba.distributed_ba_solve).

    `max_fixed` (local BA only): capacity of the FIXED OBSERVER RING —
    keyframes outside the window that observe window points join as fixed
    vertices with their observations as edges (reference Optimizer.cc:
    820-838), anchoring shared points so repeated window BAs cannot walk
    them away from their out-of-window observers."""
    K, N = state.kf_obs_point.shape
    A = state.kf_mk_slot.shape[1]
    M = state.M
    if window_all:
        # global BA: all valid keyframes (up to max_cams, newest first)
        order_key = jnp.where(state.kf_valid, state.kf_frame_id, -1)
        sel_val, sel = jax.lax.top_k(
            jnp.where(state.kf_valid, 1, 0) * (order_key + 2), max_cams
        )
        sel_ok = (sel_val > 0) & state.kf_valid[sel]
    else:
        # local BA: the center keyframe + its best covisible neighbors
        # (reference LocalBundleAdjustment local set, Optimizer.cc:777-794);
        # recency breaks ties so a fresh keyframe with few shared points yet
        # still joins the window
        from orb_slam2_aruco_tpu.worldmap.covisibility import (
            covisibility_matrix,
        )

        W = covisibility_matrix(state)
        recency = jnp.where(state.kf_valid, state.kf_frame_id, -1)
        score = jnp.where(
            state.kf_valid, W[center_kf].astype(jnp.float32) * 1e4
            + recency.astype(jnp.float32), -1.0
        )
        score = score.at[center_kf].set(jnp.float32(1e12))
        sel_val, sel = jax.lax.top_k(score, max_cams)
        sel_ok = (sel_val > 0) & state.kf_valid[sel]
        sel_val = recency[sel]  # downstream gauge logic keys on insertion age
    # gauge: fix the oldest selected valid camera + the map's first KF if in
    first_kf = jnp.argmin(
        jnp.where(state.kf_valid, state.kf_frame_id, jnp.int32(2**30))
    )
    oldest_pos = jnp.argmin(jnp.where(sel_ok, sel_val, jnp.int32(2**30)))
    cam_free = sel_ok.astype(jnp.float32)
    cam_free = cam_free.at[oldest_pos].set(0.0)
    cam_free = jnp.where(sel == first_kf, 0.0, cam_free)

    # ---- select points observed by selected cameras ----
    obs_sel = state.kf_obs_point[sel]                 # [max_cams, N]
    obs_flat = jnp.where(
        (obs_sel >= 0) & sel_ok[:, None] & state.kf_kp_valid[sel], obs_sel, state.L
    ).reshape(-1)
    pt_hit = jnp.zeros((state.L + 1,), bool).at[obs_flat].set(True)[: state.L]
    pt_hit = pt_hit & state.pt_valid

    if max_fixed > 0 and not window_all:
        # ---- fixed observer ring (Optimizer.cc:820-838) -----------------
        # keyframes observing any window point but not in the window join
        # as FIXED cameras; their observations of window points become
        # edges (the generic edge builder below masks their non-window
        # observations via the point compaction)
        inc = state.pt_obs_kf & state.kf_valid[None, :]          # [L, K]
        ring_share = jnp.dot(
            pt_hit.astype(jnp.float32), inc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )                                                        # [K]
        in_window = jnp.zeros((K,), bool).at[
            jnp.where(sel_ok, sel, K - 1)
        ].max(sel_ok)
        ring_share = jnp.where(
            in_window | ~state.kf_valid, 0.0, ring_share
        )
        ring_val, ring_sel = jax.lax.top_k(ring_share, max_fixed)
        ring_ok = ring_val > 0
        sel = jnp.concatenate([sel, ring_sel])
        sel_ok = jnp.concatenate([sel_ok, ring_ok])
        cam_free = jnp.concatenate(
            [cam_free, jnp.zeros((max_fixed,), jnp.float32)]
        )
        max_cams = max_cams + max_fixed
        obs_sel = state.kf_obs_point[sel]

    hit_score = pt_hit.astype(jnp.int32)
    if window_all:
        # GBA bucket ROTATION: when the live map exceeds max_pts, a fixed
        # top_k would optimize the same lowest-slot points every slice and
        # the remainder would only ever be rigidly carried by their ref KF
        # (the reference's GBA makes EVERY map point a vertex,
        # Optimizer.cc:98-166). Slots inside a rotating band of width
        # max_pts are preferred, and the caller advances `pt_offset` by the
        # bucket size per slice, so successive slices cover the whole map.
        band = (
            (jnp.arange(state.L, dtype=jnp.int32) - pt_offset) % state.L
        ) < max_pts
        hit_score = hit_score * (1 + band.astype(jnp.int32))
    hit_val, pt_sel = jax.lax.top_k(hit_score, max_pts)
    pt_ok = hit_val > 0
    # compact index: L -> [0, max_pts)
    comp = jnp.full((state.L + 1,), -1, jnp.int32)
    comp = comp.at[jnp.where(pt_ok, pt_sel, state.L)].set(
        jnp.arange(max_pts, dtype=jnp.int32)
    )
    comp = comp[: state.L]

    # ---- point edges: all features of selected cameras ----
    e_kf = jnp.repeat(jnp.arange(max_cams, dtype=jnp.int32), N)
    obs_comp = comp[jnp.clip(obs_sel, 0, state.L - 1)]
    e_pt = jnp.where(obs_sel >= 0, obs_comp, -1).reshape(-1)
    e_uv = state.kf_kp_uv[sel].reshape(-1, 2)
    sig2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)
    e_info = sig2[state.kf_kp_octave[sel]].reshape(-1)
    e_mask = (
        (e_pt >= 0)
        & state.kf_kp_valid[sel].reshape(-1)
        & jnp.repeat(sel_ok, N)
    ).astype(jnp.float32)
    e_pt = jnp.maximum(e_pt, 0)

    # ---- marker edges: marker observations of selected cameras ----
    mk_slot_sel = state.kf_mk_slot[sel]               # [max_cams, A]
    m_kf = jnp.repeat(jnp.arange(max_cams, dtype=jnp.int32), A * 4)
    m_marker = jnp.repeat(
        jnp.clip(mk_slot_sel, 0, M - 1).reshape(-1), 4
    )
    m_corner = jnp.tile(jnp.arange(4, dtype=jnp.int32), max_cams * A)
    m_uv = state.kf_mk_uv[sel].reshape(-1, 2)
    m_ok = (
        (mk_slot_sel >= 0)
        & state.kf_mk_valid[sel]
        & ~state.kf_mk_old[sel]
        & sel_ok[:, None]
    )
    m_mask = jnp.repeat(m_ok.reshape(-1), 4).astype(jnp.float32)
    m_info = jnp.full((max_cams * A * 4,), cfg.aruco.edge_weight)

    prob = ba.BAProblem(
        Rcw=state.kf_Rcw[sel],
        tcw=state.kf_tcw[sel],
        points=state.pt_xyz[pt_sel],
        Rwm=state.mk_Rwm,
        twm=state.mk_twm,
        marker_side=state.mk_side,
        e_kf=e_kf, e_pt=e_pt, e_uv=e_uv, e_info=e_info, e_mask=e_mask,
        m_kf=m_kf, m_marker=m_marker, m_corner=m_corner, m_uv=m_uv,
        m_info=m_info, m_mask=m_mask,
        cam_free=cam_free,
        pt_free=pt_ok.astype(jnp.float32),
        marker_free=state.mk_valid.astype(jnp.float32),
    )
    return prob, sel, sel_ok, pt_sel, pt_ok


@functools.partial(
    jax.jit, static_argnames=("cfg", "propagate", "erase_outliers")
)
def writeback_ba(
    state: MapState,
    out,                    # ba.BAResult
    e_mask,                 # [E] the problem's point-edge mask
    sel, sel_ok, pt_sel, pt_ok,
    cfg: SlamConfig,
    propagate: bool = False,
    erase_outliers: bool = True,
):
    """Scatter a BA solution back into the map state (the write-back half of
    LocalBundleAdjustment, reference Optimizer.cc:1207-1240, including the
    chi2 > 5.991 outlier-observation erase :1171-1201).

    `propagate` (global BA): points the problem's point bucket could not hold
    are corrected THROUGH their reference keyframe's pose delta — project
    into the ref KF's camera frame with its pre-BA pose, back out with its
    post-BA pose (the reference's post-GBA propagation of non-participating
    map points via their reference keyframe, LoopClosing.cc:1190-1224). A
    point whose stored ref KF slot went stale (culled/recycled) falls back
    to any current observer from the incidence matrix."""
    K, N = state.kf_obs_point.shape
    max_cams = sel.shape[0]
    # ---- write back (scatter with one pad row so masked rows are no-ops) ----
    padR = jnp.zeros((1, 3, 3), state.kf_Rcw.dtype)
    kf_Rcw = jnp.concatenate([state.kf_Rcw, padR]).at[
        jnp.where(sel_ok, sel, K)
    ].set(out.Rcw)[:K]
    padt = jnp.zeros((1, 3), state.kf_tcw.dtype)
    kf_tcw = jnp.concatenate([state.kf_tcw, padt]).at[
        jnp.where(sel_ok, sel, K)
    ].set(out.tcw)[:K]
    padp = jnp.zeros((1, 3), state.pt_xyz.dtype)
    pt_xyz = jnp.concatenate([state.pt_xyz, padp]).at[
        jnp.where(pt_ok, pt_sel, state.L)
    ].set(out.points)[: state.L]
    if propagate:
        # ---- correct out-of-bucket points via their ref KF's pose delta ----
        moved = jnp.zeros((K + 1,), bool).at[
            jnp.where(sel_ok, sel, K)
        ].max(sel_ok)[:K]
        written = jnp.zeros((state.L + 1,), bool).at[
            jnp.where(pt_ok, pt_sel, state.L)
        ].max(pt_ok)[: state.L]
        ref_raw = state.pt_ref_kf
        ref_c = jnp.clip(ref_raw, 0, K - 1)
        obs_ok = state.pt_obs_kf & state.kf_valid[None, :]       # [L, K]
        ref_live = (
            (ref_raw >= 0)
            & state.kf_valid[ref_c]
            & jnp.take_along_axis(obs_ok, ref_c[:, None], axis=1)[:, 0]
        )
        eff_ref = jnp.where(ref_live, ref_c, jnp.argmax(obs_ok, axis=1))
        eff_ok = ref_live | jnp.any(obs_ok, axis=1)
        prop = state.pt_valid & ~written & eff_ok & moved[eff_ref]
        R_old = state.kf_Rcw[eff_ref]                            # pre-BA
        t_old = state.kf_tcw[eff_ref]
        R_new = kf_Rcw[eff_ref]                                  # post-BA
        t_new = kf_tcw[eff_ref]
        x_cam = jnp.einsum("lij,lj->li", R_old, state.pt_xyz) + t_old
        x_prop = jnp.einsum("lji,lj->li", R_new, x_cam - t_new)
        pt_xyz = jnp.where(prop[:, None], x_prop, pt_xyz)
    # outlier edge erase — LOCAL BA ONLY (reference LocalBundleAdjustment
    # erases chi2 > 5.991 observations, Optimizer.cc:1171-1201; its GLOBAL
    # BA does not, Optimizer.cc:50-307). A post-loop GBA runs in short
    # slices from a freshly corrected map whose residuals start large —
    # erasing there would strip exactly the cross-seam associations the
    # optimization is about to iron out.
    if erase_outliers:
        edge_bad = (out.edge_chi2 > cfg.optim.chi2_mono) & (e_mask > 0)
    else:
        edge_bad = jnp.zeros_like(e_mask, dtype=bool)
    obs_rows = state.kf_obs_point[sel].reshape(-1)
    obs_rows = jnp.where(edge_bad, -1, obs_rows).reshape(max_cams, N)
    kf_obs = jnp.concatenate(
        [state.kf_obs_point, jnp.zeros((1, N), jnp.int32)]
    ).at[jnp.where(sel_ok, sel, K)].set(obs_rows)[:K]
    # rebuild the incidence columns of the window keyframes (outlier-erased
    # observations must leave the point<->KF incidence too)
    def col_of(row):
        return jnp.zeros((state.L,), bool).at[
            jnp.clip(row, 0, state.L - 1)
        ].max(row >= 0)

    cols = jax.vmap(col_of, out_axes=1)(obs_rows)     # [L, max_cams]
    pt_obs_kf = jnp.concatenate(
        [state.pt_obs_kf, jnp.zeros((state.L, 1), bool)], axis=1
    ).at[:, jnp.where(sel_ok, sel, K)].set(cols)[:, :K]
    state = state._replace(
        kf_Rcw=kf_Rcw,
        kf_tcw=kf_tcw,
        pt_xyz=pt_xyz,
        kf_obs_point=kf_obs,
        pt_obs_kf=pt_obs_kf,
        mk_Rwm=jnp.where(state.mk_valid[:, None, None], out.Rwm, state.mk_Rwm),
        mk_twm=jnp.where(state.mk_valid[:, None], out.twm, state.mk_twm),
    )
    return state, out.chi2


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_cams", "max_pts", "iters", "window_all", "max_fixed"
    ),
)
def bundle_adjust(
    state: MapState,
    center_kf,
    cam: Camera,
    cfg: SlamConfig,
    max_cams: int = 16,
    max_pts: int = 4096,
    iters: int = 10,
    window_all: bool = False,
    max_fixed: int = 0,
    pt_offset=0,
):
    """Windowed BA over the newest `max_cams` keyframes (LocalBundleAdjustment,
    reference src/Optimizer.cc:772-1242) or all keyframes (global BA) when
    window_all. The oldest selected camera (and the map's first keyframe) are
    held fixed as gauge anchors; out-of-window keyframes observing window
    points join as a FIXED observer ring of up to `max_fixed` cameras
    (Optimizer.cc:820-838); all valid markers participate with corner
    edges at weight 25. Small windows solve the reduced camera system
    densely; large ones use the matrix-free PCG path (optim.ba.ba_solve
    solver='auto')."""
    prob, sel, sel_ok, pt_sel, pt_ok = build_ba_problem(
        state, center_kf, cfg, max_cams=max_cams, max_pts=max_pts,
        window_all=window_all, max_fixed=max_fixed, pt_offset=pt_offset,
    )
    out = ba.ba_solve(
        prob, cam, iters=iters,
        huber_delta=cfg.optim.huber_delta,
        lam0=cfg.optim.lm_lambda_init,
    )
    return writeback_ba(state, out, prob.e_mask, sel, sel_ok, pt_sel, pt_ok,
                        cfg, propagate=window_all,
                        erase_outliers=not window_all)


def bundle_adjust_distributed(
    state: MapState,
    center_kf,
    cam: Camera,
    cfg: SlamConfig,
    mesh,
    max_cams: int = 256,
    max_pts: int = 8192,
    iters: int = 10,
    window_all: bool = True,
    pt_offset=0,
):
    """Global BA with observations sharded over a device mesh
    (parallel.dist_ba.distributed_ba_solve): the same build/write-back as
    bundle_adjust, the Schur solve's segment reductions psum'd over ICI —
    the north-star distributed GBA wired to the live map state. Enabled in
    the tracking loop via cfg.optim.distributed_gba."""
    from orb_slam2_aruco_tpu.parallel import dist_ba

    prob, sel, sel_ok, pt_sel, pt_ok = build_ba_problem(
        state, center_kf, cfg, max_cams=max_cams, max_pts=max_pts,
        window_all=window_all, pt_offset=pt_offset,
    )
    out = dist_ba.distributed_ba_solve(
        prob, cam, mesh, iters=iters,
        huber_delta=cfg.optim.huber_delta,
        lam0=cfg.optim.lm_lambda_init,
    )
    # distributed_ba_solve pads the edge lists to the mesh size; the write-
    # back indexes edges by the ORIGINAL [max_cams * N] layout
    out = out._replace(edge_chi2=out.edge_chi2[: prob.e_kf.shape[0]])
    return writeback_ba(state, out, prob.e_mask, sel, sel_ok, pt_sel, pt_ok,
                        cfg, propagate=window_all,
                        erase_outliers=not window_all)


# ---------------------------------------------------------------------------
# keyframe culling
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def cull_keyframes(state: MapState, keep_kf, cfg: SlamConfig, force=False):
    """KeyFrameCulling (reference src/LocalMapping.cc:1000-1082): a keyframe
    is redundant if >= 90% of its map points are observed by >= 3 other
    keyframes; keep it anyway if it observes a marker with <= 5 total
    observations (the marker-protection rule, LocalMapping.cc:1061-1079).
    `keep_kf` (the current KF) and the map's first keyframe are never culled.
    At most one keyframe is culled per call (like one pass of the reference's
    loop over local keyframes).

    `force` (traced bool): when the keyframe pool is at capacity the engine
    must evict SOMETHING before it can insert (the reference's map grows
    unboundedly; a fixed slot pool cannot) — with force=True the
    most-redundant eligible keyframe is culled even below the 90% gate.
    Rare-marker observers and the first keyframe stay protected."""
    K, N = state.kf_obs_point.shape
    L = state.L

    obs = jnp.where(
        state.kf_kp_valid & state.kf_valid[:, None], state.kf_obs_point, -1
    )
    # observing KEYFRAMES per point from the maintained [L, K] table (the
    # reference counts observations = keyframes, MapPoint::Observations();
    # and no 300k-id segment sort per call)
    cnt = jnp.sum(
        (state.pt_obs_kf & state.kf_valid[None, :]).astype(jnp.int32), axis=1
    )
    has_pt = obs >= 0
    redundant = has_pt & (cnt[jnp.clip(obs, 0, L - 1)] >= 4)  # self + 3 others
    n_pts = jnp.sum(has_pt.astype(jnp.float32), axis=1)
    n_red = jnp.sum(redundant.astype(jnp.float32), axis=1)
    ratio = n_red / jnp.maximum(n_pts, 1.0)

    # marker protection: total observations per marker
    M = state.M
    mk_obs_flat = jnp.where(
        state.kf_mk_valid & state.kf_valid[:, None], state.kf_mk_slot, -1
    )
    mk_cnt = jnp.zeros((M + 1,), jnp.int32).at[
        jnp.where(mk_obs_flat >= 0, mk_obs_flat, M).reshape(-1)
    ].add(1)[:M]
    rare = mk_cnt <= cfg.map.kf_cull_marker_min_obs
    sees_rare = jnp.any(
        jnp.where(
            mk_obs_flat >= 0, rare[jnp.clip(mk_obs_flat, 0, M - 1)], False
        ),
        axis=1,
    )

    first_kf = jnp.argmin(
        jnp.where(state.kf_valid, state.kf_frame_id, jnp.int32(2**30))
    )
    # loop-edge protection: a keyframe holding a persistent loop edge is
    # never erased (reference KeyFrame::SetErase keeps mbNotErase while
    # mspLoopEdges is non-empty, src/KeyFrame.cc:527-548) — culling it
    # would silently drop the stored seam constraint from every later
    # essential-graph optimization
    in_loop_edge = (
        jnp.zeros((K,), bool)
        .at[jnp.clip(state.loop_i, 0, K - 1)].max(state.loop_valid)
        .at[jnp.clip(state.loop_j, 0, K - 1)].max(state.loop_valid)
    )
    eligible = state.kf_valid & ~sees_rare & ~in_loop_edge
    eligible = eligible.at[keep_kf].set(False).at[first_kf].set(False)
    candidate = (
        eligible & (ratio > cfg.map.kf_cull_redundancy) & (n_pts > 10)
    )
    # score: 90%-redundant candidates always beat forced evictions; among
    # forced evictions the highest redundancy ratio goes first
    score = jnp.where(
        candidate,
        2.0 + ratio,
        jnp.where(eligible & jnp.asarray(force), ratio, -1.0),
    )
    any_c = jnp.max(score) >= 0.0
    victim = jnp.argmax(score)
    kf_valid = jnp.where(
        any_c, state.kf_valid.at[victim].set(False), state.kf_valid
    )
    return state._replace(kf_valid=kf_valid), jnp.where(any_c, victim, -1)


# ---------------------------------------------------------------------------
# marker plane fitting, quality promotion, one-shot scale correction
# ---------------------------------------------------------------------------


def _point_in_quad(uv, quad):
    """Convex-quad inside test by cross-product signs. uv [..., 2],
    quad [..., 4, 2] (consistent winding) -> bool [...]."""
    def cross(o, a, b):
        return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])

    signs = []
    for c in range(4):
        p0 = quad[..., c, :]
        p1 = quad[..., (c + 1) % 4, :]
        signs.append(cross(p0, p1, uv))
    s = jnp.stack(signs, axis=-1)
    return jnp.all(s >= 0, axis=-1) | jnp.all(s <= 0, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def aruco_plane_update(state: MapState, kf, cam: Camera, cfg: SlamConfig):
    """Plane-fit-based marker measurement + metric scale correction
    (CreateArucoMapPoints, reference src/LocalMapping.cc:487-797):

      * for each marker observed by keyframe `kf` with enough in-quad map
        points: fit a plane (trimmed least squares instead of the reference's
        RANSAC — same SVD normal), intersect the corner viewing rays with it,
        measure the marker side length, accumulate mk_mean_len;
      * promote `isWellComputed` when the marker normal agrees with the plane
        (<15 deg or >165 deg), count nBadComputed in (40, 140) deg and mark
        the marker bad after 3 strikes (LocalMapping.cc:620-644);
      * one-shot global scale correction for keypoint-initialized maps: when
        >= `scale_corr_min_markers` markers agree on the measured length
        within `scale_corr_max_len_diff`, rescale every point, keyframe
        translation, and marker position by s = true_size / mean_len
        (LocalMapping.cc:654-704)."""
    A = state.kf_mk_slot.shape[1]
    N = state.kf_obs_point.shape[1]
    Rcw = state.kf_Rcw[kf]
    tcw = state.kf_tcw[kf]
    Rwc, twc = se3_inverse(Rcw, tcw)

    obs = state.kf_obs_point[kf]
    has_pt = (obs >= 0) & state.kf_kp_valid[kf] & state.pt_valid[
        jnp.maximum(obs, 0)
    ]
    X = state.pt_xyz[jnp.maximum(obs, 0)]            # [N, 3]
    uv = state.kf_kp_uv[kf]

    quads = state.kf_mk_uv[kf]                       # [A, 4, 2]
    mk_slots = state.kf_mk_slot[kf]
    mk_obs_ok = state.kf_mk_valid[kf] & (mk_slots >= 0)

    inside = jax.vmap(
        lambda q: _point_in_quad(uv, jnp.broadcast_to(q, (N, 4, 2)))
    )(quads)                                         # [A, N]
    w0 = inside & has_pt[None, :]                    # [A, N]

    n_in = jnp.sum(w0, axis=1)
    enough = n_in >= cfg.aruco.plane_fit_min_points

    # ---- persistent marker<->point correlation (MapPointRelatedAruco,
    # reference LocalMapping.cc:469-485 + MapPoint.cc:132: every map point
    # whose feature lies inside an observed marker quad gets tagged with
    # that marker — forflag/mArucoID). Tag regardless of plane-fit success,
    # like the reference; scatter point slot -> marker slot.
    slot_per_feat = jnp.max(
        jnp.where(w0 & mk_obs_ok[:, None],
                  jnp.clip(mk_slots, 0, state.M - 1)[:, None], -1),
        axis=0,
    )                                                # [N]
    tag_tgt = jnp.where(
        (slot_per_feat >= 0) & has_pt, jnp.maximum(obs, 0), state.L
    )
    pt_aruco = jnp.concatenate(
        [state.pt_aruco, jnp.zeros((1,), jnp.int32)]
    ).at[tag_tgt].max(slot_per_feat)[: state.L]
    state = state._replace(pt_aruco=pt_aruco)

    # RANSAC plane hypotheses (the reference fits cntMPok/2 random 5-point
    # planes, LocalMapping.cc:566-607): H hypotheses per marker, each a
    # 5-point least-squares plane; the WINNING hypothesis is the one whose
    # ray-intersected marker corners give the most EQUAL side lengths — the
    # reference accepts a hypothesis only when max|l_i - mean| < 0.015 m
    # (:614-618), which is what rejects tilted planes fitted through
    # mismatched points (a tilted plane yields a skewed quad).
    H = 16
    key = jax.random.fold_in(jax.random.PRNGKey(17), kf)
    logits = jnp.where(w0, 0.0, -jnp.inf)            # [A, N]
    # guard fully-empty rows (categorical over -inf only -> garbage index;
    # masked out by `enough` downstream)
    logits = jnp.where(
        jnp.any(w0, axis=1, keepdims=True), logits, 0.0
    )
    samp = jax.random.categorical(
        key, logits[:, None, :], axis=-1, shape=(A, H, 5)
    )                                                # [A, H, 5] point indices

    def fit5(idx):
        P5 = X[idx]                                  # [5, 3]
        mu = jnp.mean(P5, axis=0)
        d = P5 - mu
        C = d.T @ d
        _, evecs = jnp.linalg.eigh(C)
        return mu, evecs[:, 0]

    mu_h, nrm_h = jax.vmap(jax.vmap(fit5))(samp)     # [A, H, 3] x2

    # corner rays: world direction through each observed corner pixel
    xn = cam_mod.pixels_to_normalized(cam, quads)    # [A, 4, 2]
    d_cam = jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)
    d_w = jnp.einsum("ij,acj->aci", Rwc, d_cam)      # [A, 4, 3]
    denom = jnp.einsum("aci,ahi->ahc", d_w, nrm_h)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    lam_h = (
        jnp.einsum("ahi,ahi->ah", mu_h - twc[None, None, :], nrm_h)[..., None]
        / denom
    )                                                # [A, H, 4]
    corners_h = (
        twc[None, None, None, :] + lam_h[..., None] * d_w[:, None]
    )                                                # [A, H, 4, 3]
    sides_h = jnp.linalg.norm(
        corners_h - jnp.roll(corners_h, -1, axis=2), axis=-1
    )                                                # [A, H, 4]
    mean_h = jnp.mean(sides_h, axis=-1)
    maxdiff_h = jnp.max(jnp.abs(sides_h - mean_h[..., None]), axis=-1)
    cheir_h = (lam_h > 0.05).all(axis=-1) & jnp.isfinite(mean_h)
    maxdiff_h = jnp.where(cheir_h, maxdiff_h, jnp.inf)
    best = jnp.argmin(maxdiff_h, axis=1)             # [A]
    take = lambda arr: jnp.take_along_axis(
        arr, best.reshape((A,) + (1,) * (arr.ndim - 1)), axis=1
    )[:, 0]
    nrm = take(nrm_h)                                # [A, 3]
    mean_len = take(mean_h)
    maxdiff = take(maxdiff_h)
    lam = take(lam_h)
    len_ok = (
        enough
        & mk_obs_ok
        & (lam > 0.05).all(axis=1)
        & jnp.isfinite(mean_len)
        & (maxdiff < cfg.aruco.scale_corr_max_len_diff)
    )

    # accumulate per-marker measured length
    slots_safe = jnp.clip(mk_slots, 0, state.M - 1)
    tgtm = jnp.where(len_ok, slots_safe, state.M)
    mk_mean_len = jnp.concatenate([state.mk_mean_len, jnp.zeros((1,))]).at[
        tgtm
    ].add(mean_len)[: state.M]
    mk_len_cnt = jnp.concatenate([state.mk_len_cnt, jnp.zeros((1,))]).at[
        tgtm
    ].add(1.0)[: state.M]

    # normal agreement: marker z axis vs plane normal
    z_w = state.mk_Rwm[slots_safe][:, :, 2]          # [A, 3]
    cosang = jnp.abs(jnp.sum(z_w * nrm, axis=1)) / jnp.maximum(
        jnp.linalg.norm(nrm, axis=1), 1e-9
    )
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, 0.0, 1.0)))  # 0..90
    # old/loop markers never promote or demote (reference gates both with
    # isIdxArucoOld(i)==false, LocalMapping.cc:620-633)
    not_old = ~state.kf_mk_old[kf]
    well = len_ok & not_old & (ang < cfg.aruco.plane_angle_good_deg)
    bad = len_ok & not_old & (ang > cfg.aruco.plane_angle_bad_lo_deg)
    import os as _os
    if _os.environ.get("SLAM_DEBUG_PLANE"):
        jax.debug.print(
            "PLANEDBG slots={s} n_in={n} ang={a} len={l} well={w} bad={b}",
            s=mk_slots, n=n_in, a=ang, l=mean_len, w=well, b=bad,
        )
    mk_well = jnp.concatenate([state.mk_well, jnp.zeros((1,), bool)]).at[
        jnp.where(well, slots_safe, state.M)
    ].set(True)[: state.M]
    mk_nbad = jnp.concatenate([state.mk_nbad, jnp.zeros((1,), jnp.int32)]).at[
        jnp.where(bad, slots_safe, state.M)
    ].add(1)[: state.M]
    # a marker that has EVER been well-computed is immune to strike-out
    # (reference: SetBadFlag only if nBadComputed>=3 && !isWellComputed,
    # LocalMapping.cc:639-644)
    strike_out = (mk_nbad >= cfg.aruco.max_bad_computed) & ~mk_well
    mk_valid = state.mk_valid & ~strike_out

    # ---- one-shot scale correction (keypoint-init only) ------------------
    have = mk_valid & (mk_len_cnt > 0)
    est_len = mk_mean_len / jnp.maximum(mk_len_cnt, 1.0)
    est_len_v = jnp.where(have, est_len, jnp.nan)
    lmin = jnp.nanmin(est_len_v)
    lmax = jnp.nanmax(est_len_v)
    n_have = jnp.sum(have.astype(jnp.int32))
    consistent = (
        (~state.scale_done)
        & (n_have >= cfg.aruco.scale_corr_min_markers)
        & ((lmax - lmin) < cfg.aruco.scale_corr_max_len_diff)
    )
    mean_all = jnp.nansum(est_len_v) / jnp.maximum(n_have, 1)
    s = jnp.where(
        consistent, cfg.aruco.marker_size / jnp.maximum(mean_all, 1e-6), 1.0
    )
    state = state._replace(
        pt_xyz=state.pt_xyz * s,
        kf_tcw=state.kf_tcw * s,
        mk_twm=state.mk_twm * s,
        pt_min_dist=state.pt_min_dist * s,
        pt_max_dist=state.pt_max_dist * s,
        mk_mean_len=mk_mean_len * jnp.where(consistent, s, 1.0),
        mk_len_cnt=mk_len_cnt,
        mk_well=mk_well,
        mk_nbad=mk_nbad,
        mk_valid=mk_valid,
        scale_done=state.scale_done | consistent,
    )
    return state, s


# ---------------------------------------------------------------------------
# duplicate map-point fusion
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("cfg", "restrict_covisible", "radius_scale")
)
def fuse_duplicates(state: MapState, kf, cam: Camera, cfg: SlamConfig,
                    restrict_covisible: bool = True,
                    radius_scale: float = 0.05):
    """Merge duplicated map points (SearchInNeighbors/Fuse, reference
    src/LocalMapping.cc:822-902, ORBmatcher::Fuse src/ORBmatcher.cc:829):
    a point observed by the current keyframe that lies within the scale-
    appropriate radius of an OLDER point with a matching descriptor is merged
    into it (the older slot wins, like MapPoint::Replace keeping the more-
    observed point, reference src/MapPoint.cc:206)."""
    L = state.L
    obs = state.kf_obs_point[kf]                   # [N] my point slots
    N = obs.shape[0]
    my_slot = jnp.clip(obs, 0, L - 1)
    my_ok = (obs >= 0) & state.pt_valid[my_slot] & state.kf_kp_valid[kf]
    # fuse only against the covisible neighborhood's points (the reference
    # fuses with 1st/2nd-ring covisible keyframes only, LocalMapping.cc:822):
    # fusing against the WHOLE map would silently merge revisited areas and
    # suppress loop closure. Reductions over the maintained [L, K] table —
    # no segment sorts
    inc = state.pt_obs_kf & state.kf_valid[None, :]          # [L, K]
    mine_set = jnp.zeros((L,), bool).at[my_slot].set(my_ok)
    share = jnp.dot(
        mine_set.astype(jnp.float32), inc.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )                                                        # [K]
    covis_kf = (share >= 1) & state.kf_valid
    tgt_mask = jnp.any(inc & covis_kf[None, :], axis=1)
    if not restrict_covisible:
        # loop-closure fusion (SearchAndFuse, LoopClosing.cc:1074-1100): the
        # whole map is a target so the two sides of the loop merge
        tgt_mask = jnp.ones_like(tgt_mask)
    # candidates: my (<=N) points vs covisible points — [N, L] stays bounded
    # by the per-frame feature budget, not by map capacity
    d2 = jnp.sum(
        (state.pt_xyz[my_slot][:, None, :] - state.pt_xyz[None, :, :]) ** 2,
        axis=-1,
    )
    from orb_slam2_aruco_tpu.ops.orb import unpack_pm1

    A = unpack_pm1(state.pt_desc[my_slot])
    B = unpack_pm1(state.pt_desc)
    sim = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    hamm = (256.0 - sim) * 0.5
    # merge radius ~ radius_scale * scale-band distance. The default maps
    # to roughly the reference Fuse's th=3-4 px projection window at
    # typical depths; POST-LOOP whole-map fusion passes a TIGHTER scale
    # (the seam residual has not been ironed out by GBA yet — merging
    # across it would weld mismatched structure, reference SearchAndFuse
    # uses th=4 px on CORRECTED projections, LoopClosing.cc:1074-1100)
    radius = radius_scale * jnp.maximum(
        state.pt_max_dist[my_slot][:, None], 0.2
    )
    cand = (
        my_ok[:, None]
        & state.pt_valid[None, :]
        & tgt_mask[None, :]
        & (d2 < radius * radius)
        & (hamm < cfg.matcher.th_low)
    )
    # only merge INTO a strictly older point — ordered by creation SEQUENCE
    # (pt_first_kf holds kf_seq, monotone under slot recycling), slot as tiebreak
    first_mine = state.pt_first_kf[my_slot]
    older = (state.pt_first_kf[None, :] < first_mine[:, None]) | (
        (state.pt_first_kf[None, :] == first_mine[:, None])
        & (jnp.arange(L)[None, :] < my_slot[:, None])
    )
    cand = cand & older
    row_has = jnp.any(cand, axis=1)                # [N]
    row_tgt = jnp.argmax(cand, axis=1)             # [N]
    # scatter back to [L]: min target per source slot
    has_tgt = jnp.zeros((L,), bool).at[my_slot].max(row_has)
    tgt_l = jnp.full((L,), L, jnp.int32).at[my_slot].min(
        jnp.where(row_has, row_tgt, L)
    )
    tgt = jnp.where(has_tgt, jnp.clip(tgt_l, 0, L - 1), jnp.arange(L))
    merged_to = tgt
    # one-step union only (chains resolve over subsequent keyframes)
    pt_valid = state.pt_valid & ~has_tgt
    # remap every observation table entry
    obs_all = state.kf_obs_point
    obs_safe = jnp.clip(obs_all, 0, L - 1)
    remapped = jnp.where(obs_all >= 0, merged_to[obs_safe], obs_all)
    # merge found/visible counters into the target
    add_found = jnp.zeros((L,)).at[tgt].add(
        jnp.where(has_tgt, state.pt_found, 0.0)
    )
    add_vis = jnp.zeros((L,)).at[tgt].add(
        jnp.where(has_tgt, state.pt_visible, 0.0)
    )
    # incidence rows: the merge target inherits the source's observing KFs
    # (compacted to a fixed budget of fused pairs — fusion merges a handful
    # of duplicates per call, never the whole map)
    F = 256
    _, src_idx = jax.lax.top_k(has_tgt.astype(jnp.int32), min(F, L))
    src_ok = has_tgt[src_idx]
    dst_idx = jnp.where(src_ok, tgt[src_idx], L)
    Kk = state.pt_obs_kf.shape[1]
    pt_obs_kf = jnp.concatenate(
        [state.pt_obs_kf, jnp.zeros((1, Kk), bool)]
    ).at[dst_idx].max(state.pt_obs_kf[src_idx])[:L]
    state = state._replace(
        pt_valid=pt_valid,
        kf_obs_point=remapped,
        pt_found=state.pt_found + add_found,
        pt_visible=state.pt_visible + add_vis,
        pt_obs_kf=pt_obs_kf,
    )
    # merged_to is returned so the HOST can forward the live tracking
    # context's observation indices through the merge — the reference's
    # CheckReplacedInLastFrame (Tracking.cc:836): without it, a whole-map
    # post-loop fusion merges away most of the last frame's points and the
    # next frame's motion-model stage starts with zero candidates
    return state, jnp.sum(has_tgt.astype(jnp.int32)), merged_to


# ---------------------------------------------------------------------------
# point statistics maintenance
# ---------------------------------------------------------------------------


MAX_DESC_OBS = 8  # descriptors per point considered for distinctiveness


@functools.partial(jax.jit, static_argnames=("cfg",))
def distinctive_descriptors(state: MapState, cfg: SlamConfig, kf=None):
    """Per-point representative descriptor = the observed descriptor with
    minimum median Hamming distance to the point's other observations
    (MapPoint::ComputeDistinctiveDescriptors, reference src/MapPoint.cc:271).

    `kf` (traced scalar, optional): restrict the recomputation to the points
    observed by that keyframe — what one keyframe insert actually changes
    (the reference recomputes per affected MapPoint, not over the map). The
    pairwise-Hamming tensor then shrinks from [L, O, O] to [N, O, O]
    (20000 -> ~1200 rows at the flagship config). Pass None after fusion /
    loop correction, where the affected set is unbounded.

    TPU-shape formulation (no sequential pass over keyframes): a vmapped
    scatter builds the per-keyframe inverse map point->feature (first
    feature wins — fusion can leave two features of one KF on the same
    point), a stable top-k over the transposed incidence picks each point's
    first O = MAX_DESC_OBS observing keyframes, and a batched gather fills
    the [L, O, 8] descriptor table; pairwise distances are XOR + popcount;
    the median is a masked sorted-gather at index floor((cnt-1)/2), matching
    the reference's vDists[0.5*(N-1)] with the self-distance included."""
    K, N = state.kf_obs_point.shape
    L = state.L
    O = MAX_DESC_OBS

    obs_all = jnp.where(
        state.kf_kp_valid & state.kf_valid[:, None], state.kf_obs_point, -1
    )                                                     # [K, N]

    def inv_row(obs_k):
        # first feature of this keyframe observing each point (N = none)
        return jnp.full((L,), N, jnp.int32).at[
            jnp.clip(obs_k, 0, L - 1)
        ].min(jnp.where(obs_k >= 0, jnp.arange(N, dtype=jnp.int32), N))

    inv = jax.vmap(inv_row)(obs_all)                      # [K, L]
    if kf is None:
        rows = None
        invT = inv.T                                      # [L, K]
        row_valid = state.pt_valid
    else:
        pts = jnp.where(state.kf_kp_valid[kf], state.kf_obs_point[kf], -1)
        rows = jnp.clip(pts, 0, L - 1)                    # [N]
        invT = inv[:, rows].T                             # [N, K]
        row_valid = (pts >= 0) & state.pt_valid[rows]
    observes = (invT < N).astype(jnp.int32)
    # first O observing keyframes per point (top_k is stable: equal values
    # keep ascending slot order, mirroring the old slot-order fill)
    vals, kf_sel = jax.lax.top_k(observes, O)             # [rows, O]
    jv_sel = vals > 0
    cnt = jnp.sum(jv_sel, axis=-1).astype(jnp.int32)      # [rows]
    feat = jnp.take_along_axis(invT, kf_sel, axis=1)      # [rows, O]
    desc = state.kf_desc[kf_sel, jnp.clip(feat, 0, N - 1)]  # [rows, O, 8]
    table = jnp.where(jv_sel[..., None], desc, jnp.uint32(0))

    x = jax.lax.population_count(table[:, :, None, :] ^ table[:, None, :, :])
    dist = jnp.sum(x, axis=-1).astype(jnp.int32)   # [L, O, O]
    jv = jnp.arange(O)[None, :] < cnt[:, None]     # [L, O] valid observations
    dist = jnp.where(jv[:, None, :], dist, 512)
    srt = jnp.sort(dist, axis=-1)                  # [L, O, O]
    med_idx = jnp.clip((cnt - 1) // 2, 0, O - 1)   # [L]
    med = jnp.take_along_axis(
        srt, med_idx[:, None, None].repeat(O, axis=1), axis=-1
    )[..., 0]                                      # [L, O]
    med = jnp.where(jv, med, 10**9)
    best = jnp.argmin(med, axis=-1)                # [rows]
    best_desc = jnp.take_along_axis(
        table, best[:, None, None].repeat(8, axis=-1), axis=1
    )[:, 0, :]
    use = (cnt > 0) & row_valid
    if rows is None:
        return state._replace(
            pt_desc=jnp.where(use[:, None], best_desc, state.pt_desc)
        )
    # scatter only the valid rows (invalid slots route out of bounds and
    # drop — duplicate in-bounds writers would race with .set otherwise)
    rows_s = jnp.where(use, rows, L)
    new_desc = state.pt_desc.at[rows_s].set(best_desc, mode="drop")
    return state._replace(pt_desc=new_desc)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_point_stats(state: MapState, cfg: SlamConfig):
    """Refresh per-point viewing normals and scale-invariance bands from the
    current observation table (MapPoint::UpdateNormalAndDepth, reference
    src/MapPoint.cc:359): normal = mean unit direction from observing keyframe
    centers; max_dist from the anchor observation's octave."""
    L = state.L
    # dense masked mean over the maintained [L, K] observation table: the
    # [L, K, 3] direction tensor is pure bandwidth (~ms), where the previous
    # segment-sum formulation sorted K*N observation ids per call
    m = (state.pt_obs_kf & state.kf_valid[None, :]).astype(jnp.float32)
    Rwc = jnp.swapaxes(state.kf_Rcw, -1, -2)
    centers = -jnp.einsum("kij,kj->ki", Rwc, state.kf_tcw)     # [K, 3]
    d = state.pt_xyz[:, None, :] - centers[None, :, :]         # [L, K, 3]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    sum_d = jnp.einsum("lkj,lk->lj", d, m)
    cnt = jnp.sum(m, axis=1)
    normal = sum_d / jnp.maximum(
        jnp.linalg.norm(sum_d, axis=-1, keepdims=True), 1e-9
    )
    has = cnt > 0
    normal = jnp.where(has[:, None] & state.pt_valid[:, None], normal,
                       state.pt_normal)
    return state._replace(pt_normal=normal)
