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
            kf_seq=state.kf_seq.at[k].set(k),
            next_seq=jnp.asarray(k + 1, jnp.int32),
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


def test_covis_edge_set_matches_direct_count(rng):
    """The essential graph must contain EVERY covisibility pair with weight
    >= minFeat (reference Optimizer.cc:1416-1440, GetCovisiblesByWeight(100))
    — no top-N truncation — minus spanning-tree / loop-edge duplicates."""
    K = 24
    W_np = rng.integers(0, 200, size=(K, K))
    W_np = np.triu(W_np, 1)
    W_np = W_np + W_np.T
    valid = rng.random(K) > 0.2
    chain = np.arange(K) - 1                       # temporal chain parents
    chain[0] = 0
    loop_i = np.asarray([3, -1], np.int32)
    loop_j = np.asarray([17, -1], np.int32)
    loop_valid = np.asarray([True, False])
    min_covis = 100
    ci, cj, cm = loop_closing.covis_edge_set(
        jnp.asarray(W_np.astype(np.int32)), jnp.asarray(valid),
        jnp.asarray(chain.astype(np.int32)),
        jnp.asarray(np.clip(loop_i, 0, K - 1)),
        jnp.asarray(np.clip(loop_j, 0, K - 1)), jnp.asarray(loop_valid),
        min_covis,
    )
    # direct count
    n_direct = 0
    for a in range(K):
        for b in range(a + 1, K):
            if W_np[a, b] < min_covis or not (valid[a] and valid[b]):
                continue
            if chain[a] == b or chain[b] == a:
                continue
            if (a, b) in ((3, 17), (17, 3)):
                continue
            n_direct += 1
    assert int(jnp.sum(cm)) == n_direct
    # and every masked edge is a genuinely >=min_covis pair
    ci, cj, cm = np.asarray(ci), np.asarray(cj), np.asarray(cm)
    assert all(W_np[a, b] >= min_covis for a, b in zip(ci[cm], cj[cm]))


def test_persistent_loop_edges_protect_old_seam(rng):
    """A second loop closure must keep the FIRST loop's seam tight: the
    stored loop edge (KeyFrame::AddLoopEdge, reference KeyFrame.cc:515-525)
    re-enters the second essential-graph run (Optimizer.cc:1390-1414).
    Verified by running the second correction with and without the stored
    edge: with it, the first seam's relative pose moves far less."""
    cfg, cam, state, truth, est = build_drifted_map(rng)
    n_kf = 14
    kf_cur = jnp.asarray(n_kf - 1)
    det = loop_closing.detect_loop_by_marker(state, kf_cur, min_gap=5)
    cand = loop_closing.compute_sim3(
        state, kf_cur, det.kf_loop, det.marker_slot, cam, cfg
    )
    assert bool(cand.ok)
    state1, _ = loop_closing.correct_loop(
        state, kf_cur, det.kf_loop, cand.s, cand.R, cand.t, cam, cfg
    )
    # the first closure is stored as a persistent edge
    li = np.asarray(state1.loop_i)[np.asarray(state1.loop_valid)]
    lj = np.asarray(state1.loop_j)[np.asarray(state1.loop_valid)]
    assert list(li) == [n_kf - 1] and list(lj) == [0]

    def seam_rel(st):
        Ri, ti = se3_inverse(st.kf_Rcw[0], st.kf_tcw[0])
        return se3_compose(st.kf_Rcw[n_kf - 1], st.kf_tcw[n_kf - 1], Ri, ti)

    R_seam0, t_seam0 = seam_rel(state1)

    # second closure between (12, 1) with a DELIBERATELY conflicting Sim3
    # (small offset vs the current relative pose): the graph has to absorb
    # the inconsistency somewhere
    from orb_slam2_aruco_tpu.geometry.lie import so3_exp

    R1i, t1i = se3_inverse(state1.kf_Rcw[1], state1.kf_tcw[1])
    R_rel, t_rel = se3_compose(state1.kf_Rcw[12], state1.kf_tcw[12], R1i, t1i)
    dR = so3_exp(jnp.asarray([0.0, 0.04, 0.0]))
    R_rel2 = dR @ R_rel
    t_rel2 = t_rel + jnp.asarray([0.05, 0.0, 0.02])

    state2, _ = loop_closing.correct_loop(
        state1, jnp.asarray(12), jnp.asarray(1),
        jnp.float32(1.0), R_rel2, t_rel2, cam, cfg,
    )
    # both loops stored now
    assert int(jnp.sum(state2.loop_valid)) == 2
    # ... and the same second closure WITHOUT the stored first edge
    state1_noedge = state1._replace(
        loop_valid=jnp.zeros_like(state1.loop_valid)
    )
    state2_no, _ = loop_closing.correct_loop(
        state1_noedge, jnp.asarray(12), jnp.asarray(1),
        jnp.float32(1.0), R_rel2, t_rel2, cam, cfg,
    )

    def seam_drift(st):
        R_s, t_s = seam_rel(st)
        return float(jnp.linalg.norm(t_s - t_seam0)) + float(
            jnp.linalg.norm(R_s - R_seam0)
        )

    d_with = seam_drift(state2)
    d_without = seam_drift(state2_no)
    assert d_with <= d_without + 1e-6, (d_with, d_without)
    assert d_with < 0.05, d_with


def test_loop_edges_checkpoint_roundtrip(rng, tmp_path):
    cfg, cam, state, truth, est = build_drifted_map(rng)
    state = state._replace(
        loop_i=state.loop_i.at[0].set(13),
        loop_j=state.loop_j.at[0].set(0),
        loop_valid=state.loop_valid.at[0].set(True),
    )
    from orb_slam2_aruco_tpu.io import checkpoint

    p = str(tmp_path / "m.npz")
    checkpoint.save_map(p, state)
    st2 = checkpoint.load_map(p)
    assert int(st2.loop_i[0]) == 13 and int(st2.loop_j[0]) == 0
    assert bool(st2.loop_valid[0])


def test_marker_reanchor_ambiguity_gate(rng):
    """A marker observed under an ambiguous near-frontal tilt must keep a
    consistent Twm through a loop correction: the re-anchoring IPPE solution
    is chosen by consistency with the marker's prior pose, not
    unconditionally solution 0 (reference LoopClosing.cc:781-798 uses the
    stored detection; an IPPE flip here would poison all later tracking)."""
    from orb_slam2_aruco_tpu.geometry.lie import so3_exp

    cfg, cam, state, truth, est = build_drifted_map(rng)
    n_kf = 14
    # re-pose the marker NEARLY frontal to KF0 (slight tilt => ambiguous
    # IPPE) and re-project its corners into KF0 and the last KF
    R_true, t_true = truth
    Rw0, tw0 = se3_inverse(R_true[0], t_true[0])
    tilt = so3_exp(jnp.asarray([0.06, 0.0, 0.0]))   # ~3.4 deg off frontal
    Rwm = Rw0 @ tilt
    twm = jnp.asarray([0.0, 0.0, 0.3])
    corners_w = marker_corner_points_world(Rwm, twm, 0.165)
    state = state._replace(
        mk_Rwm=state.mk_Rwm.at[0].set(Rwm),
        mk_twm=state.mk_twm.at[0].set(twm),
    )
    for k in (0, n_kf - 1):
        pc = se3_apply(
            jnp.broadcast_to(R_true[k], (4, 3, 3)),
            jnp.broadcast_to(t_true[k], (4, 3)),
            corners_w,
        )
        uvm = cam_mod.project(cam, pc)
        state = state._replace(
            kf_mk_uv=state.kf_mk_uv.at[k, 0].set(uvm),
        )
    z_before = np.asarray(state.mk_Rwm[0][:, 2])
    det = loop_closing.detect_loop_by_marker(
        state, jnp.asarray(n_kf - 1), min_gap=5
    )
    assert bool(det.found)
    cand = loop_closing.compute_sim3(
        state, jnp.asarray(n_kf - 1), det.kf_loop, det.marker_slot, cam, cfg
    )
    state2, _ = loop_closing.correct_loop(
        state, jnp.asarray(n_kf - 1), det.kf_loop,
        cand.s, cand.R, cand.t, cam, cfg,
    )
    z_after = np.asarray(state2.mk_Rwm[0][:, 2])
    # the marker's normal must not flip through the correction
    assert float(np.dot(z_before, z_after)) > 0.9, (z_before, z_after)
