"""Loop closing on a synthetically drifted map: marker loop detection ->
Sim3 -> essential-graph correction must remove accumulated drift."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.lie import (
    se3_apply,
    se3_compose,
    se3_exp,
    se3_inverse,
)
from orb_slam2_aruco_tpu.optim.residuals import marker_corner_points_world
from orb_slam2_aruco_tpu.pipeline import loop_closing
from orb_slam2_aruco_tpu.worldmap.state import empty_map

CAMC = CameraConfig(
    fx=300.0, fy=300.0, cx=160.0, cy=120.0, dist=(0, 0, 0, 0, 0),
    width=320, height=240,
)


def build_drifted_map(rng, n_kf=14, n_pts=160, drift_per_kf=0.015):
    """Ground-truth circular-ish trajectory observing a point cloud + one
    marker; stored keyframe poses accumulate odometry drift, except KF 0."""
    cfg = SlamConfig().replace(camera=CAMC)
    cfg = cfg.replace(
        map=cfg.map.__class__(max_keyframes=16, max_points=512, max_markers=8),
        orb=cfg.orb.__class__(num_features=256),
    )
    cam = cam_mod.camera_from_config(CAMC)
    state = empty_map(cfg)

    # ground truth trajectory: lateral sweep that returns to the start
    R_true, t_true = [], []
    for k in range(n_kf):
        a = 2 * np.pi * k / n_kf
        from orb_slam2_aruco_tpu.geometry.lie import so3_exp

        R = so3_exp(jnp.asarray([0.0, 0.25 * np.sin(a), 0.0], dtype=jnp.float32))
        c = jnp.asarray([0.6 * np.sin(a), 0.1 * np.sin(2 * a), -2.0],
                        dtype=jnp.float32)
        t = -(R @ c)
        R_true.append(R)
        t_true.append(t)

    # drifted poses: accumulate noisy relative transforms
    R_est = [R_true[0]]
    t_est = [t_true[0]]
    for k in range(1, n_kf):
        Ri, ti = se3_inverse(R_true[k - 1], t_true[k - 1])
        Rrel, trel = se3_compose(R_true[k], t_true[k], Ri, ti)
        dxi = jnp.asarray(rng.normal(size=6) * drift_per_kf, dtype=jnp.float32)
        dR, dt = se3_exp(dxi)
        Rrel, trel = se3_compose(dR, dt, Rrel, trel)
        Rk, tk = se3_compose(Rrel, trel, R_est[-1], t_est[-1])
        R_est.append(Rk)
        t_est.append(tk)
    R_est = jnp.stack(R_est)
    t_est = jnp.stack(t_est)
    R_true = jnp.stack(R_true)
    t_true = jnp.stack(t_true)

    # Points: one physical cloud, stored TWICE like a real pre-loop map —
    # 'original' copies (slots 0..n-1, true world positions, ref KF0,
    # observed by the early keyframes) and 'drifted duplicates'
    # (slots n..2n-1, positions consistent with the drifted late poses,
    # ref KF in the current covisible group, observed by late keyframes).
    # Early and late keyframes share NO map points (non-covisible) but DO
    # share descriptors — exactly the loop-closure situation.
    pts = np.stack(
        [rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
         rng.uniform(-0.2, 0.6, n_pts)], axis=-1
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, size=(n_pts, 8), dtype=np.uint32)
    # Anchor of the drifted duplicates: the CURRENT keyframe — recently
    # created map points are accurate relative to the current camera (they
    # were triangulated from it); the loop Sim3 then measures the full
    # accumulated drift. Anchoring mid-chain would make the inverse edges
    # irreducibly inconsistent, which no Sim3 solver (reference included)
    # could gate as inliers.
    k_mid = 13
    # X_dup = T_w,mid(drifted) * T_mid,w(true) * X_true
    p_mid_true = se3_apply(
        jnp.broadcast_to(R_true[k_mid], (n_pts, 3, 3)),
        jnp.broadcast_to(t_true[k_mid], (n_pts, 3)),
        jnp.asarray(pts),
    )
    Rw_mid, tw_mid = se3_inverse(R_est[k_mid], t_est[k_mid])
    pts_dup = se3_apply(
        jnp.broadcast_to(Rw_mid, (n_pts, 3, 3)),
        jnp.broadcast_to(tw_mid, (n_pts, 3)),
        p_mid_true,
    )
    state = state._replace(
        pt_xyz=state.pt_xyz.at[:n_pts].set(jnp.asarray(pts))
        .at[n_pts : 2 * n_pts].set(pts_dup),
        pt_valid=state.pt_valid.at[: 2 * n_pts].set(True),
        pt_desc=state.pt_desc.at[:n_pts].set(jnp.asarray(descs))
        .at[n_pts : 2 * n_pts].set(jnp.asarray(descs)),
        pt_ref_kf=state.pt_ref_kf.at[:n_pts].set(0)
        .at[n_pts : 2 * n_pts].set(k_mid),
    )

    # marker at world origin area, observed by KF0 and the last KF
    Rwm = jnp.eye(3)
    twm = jnp.asarray([0.0, 0.0, 0.3])
    corners_w = marker_corner_points_world(Rwm, twm, 0.165)
    state = state._replace(
        mk_Rwm=state.mk_Rwm.at[0].set(Rwm),
        mk_twm=state.mk_twm.at[0].set(twm),
        mk_id=state.mk_id.at[0].set(7),
        mk_valid=state.mk_valid.at[0].set(True),
    )

    for k in range(n_kf):
        p = se3_apply(
            jnp.broadcast_to(R_true[k], (n_pts, 3, 3)),
            jnp.broadcast_to(t_true[k], (n_pts, 3)),
            jnp.asarray(pts),
        )
        uv = cam_mod.project(cam, p)
        vis = (p[:, 2] > 0.2) & cam_mod.in_image(cam, uv)
        # early keyframes observe the originals; late ones the duplicates
        slot_base = 0 if k < 7 else n_pts
        state = state._replace(
            kf_Rcw=state.kf_Rcw.at[k].set(R_est[k]),
            kf_tcw=state.kf_tcw.at[k].set(t_est[k]),
            kf_valid=state.kf_valid.at[k].set(True),
            kf_frame_id=state.kf_frame_id.at[k].set(k),
            kf_kp_uv=state.kf_kp_uv.at[k, :n_pts].set(uv),
            kf_desc=state.kf_desc.at[k, :n_pts].set(jnp.asarray(descs)),
            kf_kp_valid=state.kf_kp_valid.at[k, :n_pts].set(vis),
            kf_obs_point=state.kf_obs_point.at[k, :n_pts].set(
                jnp.where(vis, jnp.arange(n_pts) + slot_base, -1)
            ),
            # keep the [L, K] table in sync — the live pipeline maintains
            # both sides, and covisibility reads this one
            pt_obs_kf=state.pt_obs_kf.at[
                jnp.where(vis, jnp.arange(n_pts) + slot_base, state.L), k
            ].set(True, mode="drop"),
        )
        # marker observation in KF0 and last KF (true projections)
        if k in (0, n_kf - 1):
            pc = se3_apply(
                jnp.broadcast_to(R_true[k], (4, 3, 3)),
                jnp.broadcast_to(t_true[k], (4, 3)),
                corners_w,
            )
            uvm = cam_mod.project(cam, pc)
            state = state._replace(
                kf_mk_slot=state.kf_mk_slot.at[k, 0].set(0),
                kf_mk_uv=state.kf_mk_uv.at[k, 0].set(uvm),
                kf_mk_valid=state.kf_mk_valid.at[k, 0].set(True),
                # the current KF re-observes a marker whose latest previous
                # observation is KF0 — tracking's CheckArucoID would flag it
                # old (mvbOldAruco), which loop detection now requires
                kf_mk_old=state.kf_mk_old.at[k, 0].set(k == n_kf - 1),
            )
    return cfg, cam, state, (R_true, t_true), (R_est, t_est)


def test_loop_detect_compute_correct(rng):
    cfg, cam, state, truth, est = build_drifted_map(rng)
    n_kf = 14
    kf_cur = jnp.asarray(n_kf - 1)

    det = loop_closing.detect_loop_by_marker(state, kf_cur, min_gap=5)
    assert bool(det.found)
    assert int(det.kf_loop) == 0
    assert int(det.marker_slot) == 0

    cand = loop_closing.compute_sim3(
        state, kf_cur, det.kf_loop, det.marker_slot, cam, cfg
    )
    assert bool(cand.ok), int(cand.n_inliers)

    R_true, t_true = truth
    err_before = float(
        jnp.linalg.norm(state.kf_tcw[n_kf - 1] - t_true[n_kf - 1])
    )
    state2, chi2 = loop_closing.correct_loop(
        state, kf_cur, det.kf_loop, cand.s, cand.R, cand.t, cam, cfg
    )
    err_after = float(
        jnp.linalg.norm(state2.kf_tcw[n_kf - 1] - t_true[n_kf - 1])
    )
    # the loop-closed trajectory should remove most of the accumulated drift
    assert err_after < 0.5 * err_before, (err_before, err_after)
    # all poses finite, first KF pinned
    assert bool(jnp.all(jnp.isfinite(state2.kf_tcw)))
    np.testing.assert_allclose(
        np.asarray(state2.kf_tcw[0]), np.asarray(state.kf_tcw[0]), atol=1e-4
    )


def test_no_false_loop_without_revisit(rng):
    cfg, cam, state, truth, est = build_drifted_map(rng)
    # remove the last KF's marker observation -> no loop signal
    state = state._replace(
        kf_mk_valid=state.kf_mk_valid.at[13, 0].set(False)
    )
    det = loop_closing.detect_loop_by_marker(state, jnp.asarray(13), min_gap=5)
    assert not bool(det.found)


def test_bow_loop_detection_and_classic_sim3(rng):
    """The appearance path: remove the marker observations so only retrieval
    can find the loop; classic Horn-RANSAC Sim3 must still solve it."""
    cfg, cam, state, truth, est = build_drifted_map(rng)
    # give keyframes BoW signatures derived from their descriptors
    from orb_slam2_aruco_tpu.worldmap.retrieval import bow_vector

    for k in range(14):
        bow = bow_vector(state.kf_desc[k], state.kf_kp_valid[k],
                         cfg.retrieval.num_words)
        state = state._replace(kf_bow=state.kf_bow.at[k].set(bow))
    # drop the marker observation in the last KF: no marker loop signal
    state = state._replace(kf_mk_valid=state.kf_mk_valid.at[13, 0].set(False))
    det_mk = loop_closing.detect_loop_by_marker(state, jnp.asarray(13), min_gap=5)
    assert not bool(det_mk.found)
    det = loop_closing.detect_loop_by_bow(state, jnp.asarray(13), min_gap=5)
    assert bool(det.found)
    assert int(det.kf_loop) == 0  # same descriptors -> strongest match
    cand = loop_closing.compute_sim3_classic(
        state, jnp.asarray(13), det.kf_loop, cam, cfg
    )
    assert bool(cand.ok), int(cand.n_inliers)
    R_true, t_true = truth
    err_before = float(jnp.linalg.norm(state.kf_tcw[13] - t_true[13]))
    state2, _ = loop_closing.correct_loop(
        state, jnp.asarray(13), det.kf_loop, cand.s, cand.R, cand.t, cam, cfg
    )
    err_after = float(jnp.linalg.norm(state2.kf_tcw[13] - t_true[13]))
    assert err_after < 0.5 * err_before, (err_before, err_after)
