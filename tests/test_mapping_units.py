"""Unit tests for mapping maintenance: fusion, KF culling, point stats, viz."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.pipeline import mapping
from orb_slam2_aruco_tpu.worldmap.state import empty_map


def small_cfg():
    cfg = SlamConfig()
    return cfg.replace(
        map=cfg.map.__class__(max_keyframes=8, max_points=64, max_markers=4),
        orb=cfg.orb.__class__(num_features=32),
    )


def test_fuse_duplicates_merges_and_remaps(rng):
    cfg = small_cfg()
    cam = cam_mod.camera_from_config(cfg.camera)
    state = empty_map(cfg)
    desc = jnp.asarray(rng.integers(0, 2**32, (4, 8), dtype=np.uint32))
    # point 0 (old) and point 1 (new duplicate at nearly same position, same
    # descriptor); point 2 distinct
    state = state._replace(
        pt_xyz=state.pt_xyz.at[0].set(jnp.asarray([1.0, 2.0, 5.0]))
        .at[1].set(jnp.asarray([1.004, 2.0, 5.0]))
        .at[2].set(jnp.asarray([3.0, 1.0, 4.0])),
        pt_valid=state.pt_valid.at[:3].set(True),
        pt_desc=state.pt_desc.at[0].set(desc[0]).at[1].set(desc[0])
        .at[2].set(desc[2]),
        pt_first_kf=state.pt_first_kf.at[0].set(0).at[1].set(1).at[2].set(0),
        pt_max_dist=state.pt_max_dist.at[:3].set(5.0),
        kf_valid=state.kf_valid.at[:2].set(True),
        # KF0 observes the old point 0 and shares point 2 with KF1 (fusion is
        # restricted to the covisible neighborhood, like the reference)
        kf_kp_valid=state.kf_kp_valid.at[1, :3].set(True).at[0, :2].set(True),
        kf_obs_point=state.kf_obs_point.at[1, 0].set(1).at[1, 1].set(2)
        .at[0, 0].set(0).at[0, 1].set(2),
        pt_obs_kf=state.pt_obs_kf.at[1, 1].set(True).at[2, 1].set(True)
        .at[0, 0].set(True).at[2, 0].set(True),
    )
    out, n, _remap = mapping.fuse_duplicates(state, jnp.asarray(1), cam, cfg)
    assert int(n) == 1
    assert not bool(out.pt_valid[1])      # duplicate dropped
    assert bool(out.pt_valid[0]) and bool(out.pt_valid[2])
    # observation remapped from slot 1 to slot 0
    assert int(out.kf_obs_point[1, 0]) == 0
    assert int(out.kf_obs_point[1, 1]) == 2


def test_cull_keyframes_redundancy_and_marker_protection(rng):
    cfg = small_cfg()
    state = empty_map(cfg)
    N = cfg.orb.num_features
    n_pts = 20
    # 5 KFs all observing the same 20 points -> middle ones redundant
    state = state._replace(
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        kf_valid=state.kf_valid.at[:5].set(True),
        kf_frame_id=state.kf_frame_id.at[:5].set(jnp.arange(5)),
    )
    for k in range(5):
        state = state._replace(
            kf_kp_valid=state.kf_kp_valid.at[k, :n_pts].set(True),
            kf_obs_point=state.kf_obs_point.at[k, :n_pts].set(
                jnp.arange(n_pts)
            ),
            pt_obs_kf=state.pt_obs_kf.at[:n_pts, k].set(True),
        )
    out, victim = mapping.cull_keyframes(state, jnp.asarray(4), cfg)
    v = int(victim)
    assert v in (1, 2, 3)                 # not the first, not the current
    assert not bool(out.kf_valid[v])
    # marker protection: give KF 1 a rarely-observed marker -> survives
    state2 = state._replace(
        mk_valid=state.mk_valid.at[0].set(True),
        kf_mk_slot=state.kf_mk_slot.at[1, 0].set(0),
        kf_mk_valid=state.kf_mk_valid.at[1, 0].set(True),
    )
    out2, victim2 = mapping.cull_keyframes(state2, jnp.asarray(4), cfg)
    assert int(victim2) != 1


def test_update_point_stats_normals(rng):
    cfg = small_cfg()
    state = empty_map(cfg)
    # one point at origin+z, observed by a KF at -z looking forward
    state = state._replace(
        pt_xyz=state.pt_xyz.at[0].set(jnp.asarray([0.0, 0.0, 2.0])),
        pt_valid=state.pt_valid.at[0].set(True),
        kf_valid=state.kf_valid.at[0].set(True),
        kf_kp_valid=state.kf_kp_valid.at[0, 0].set(True),
        kf_obs_point=state.kf_obs_point.at[0, 0].set(0),
        pt_obs_kf=state.pt_obs_kf.at[0, 0].set(True),
        kf_tcw=state.kf_tcw.at[0].set(jnp.asarray([0.0, 0.0, 1.0])),
        # Rcw = I, tcw = (0,0,1) -> center at (0,0,-1); dir to point = +z
    )
    out = mapping.update_point_stats(state, cfg)
    np.testing.assert_allclose(
        np.asarray(out.pt_normal[0]), [0.0, 0.0, 1.0], atol=1e-5
    )


def test_viz_drawers(tmp_path, rng):
    from orb_slam2_aruco_tpu.viz import framedrawer

    cfg = small_cfg()
    state = empty_map(cfg)
    state = state._replace(
        pt_xyz=state.pt_xyz.at[:5].set(
            jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
        ),
        pt_valid=state.pt_valid.at[:5].set(True),
        kf_valid=state.kf_valid.at[0].set(True),
        mk_valid=state.mk_valid.at[0].set(True),
    )
    img = framedrawer.draw_map_topdown(state, size=128)
    assert img.shape == (128, 128, 3)
    gray = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    rgb, info = framedrawer.draw_frame(
        gray,
        np.asarray([[10.0, 10.0], [40.0, 30.0]]),
        np.asarray([True, False]),
        mk_corners=np.asarray([[[5, 5], [20, 5], [20, 20], [5, 20]]], np.float32),
        mk_valid=np.asarray([True]),
    )
    assert rgb.shape == (60, 80, 3)
    assert info["n_markers"] == 1
    p = str(tmp_path / "x.png")
    framedrawer.save_png(p, rgb)
    import struct

    with open(p, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_distinctive_descriptors_min_median_hamming(rng):
    """Exact check against a brute-force NumPy ComputeDistinctiveDescriptors
    (reference src/MapPoint.cc:271): min-median-Hamming over each point's
    observed descriptors, self-distance included."""
    cfg = small_cfg()
    state = empty_map(cfg)
    n_kf, n_pts = 5, 6
    descs = rng.integers(0, 2**32, (n_kf, n_pts, 8), dtype=np.uint32)
    state = state._replace(
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        kf_valid=state.kf_valid.at[:n_kf].set(True),
    )
    # KF k observes points 0..n_pts-1-k at feature slots 0..; point p's
    # observation count varies from n_kf down to 1
    obs_lists = {p: [] for p in range(n_pts)}
    for k in range(n_kf):
        m = n_pts - k
        state = state._replace(
            kf_kp_valid=state.kf_kp_valid.at[k, :m].set(True),
            kf_obs_point=state.kf_obs_point.at[k, :m].set(jnp.arange(m)),
            kf_desc=state.kf_desc.at[k, :n_pts].set(jnp.asarray(descs[k])),
        )
        for p in range(m):
            obs_lists[p].append(descs[k, p])

    out = mapping.distinctive_descriptors(state, cfg)

    def ham(a, b):
        return int(
            np.sum(np.unpackbits((a ^ b).view(np.uint8)))
        )

    for p in range(n_pts):
        ds = obs_lists[p]
        n = len(ds)
        meds = []
        for i in range(n):
            row = sorted(ham(ds[i], ds[j]) for j in range(n))
            meds.append(row[(n - 1) // 2])
        expect = ds[int(np.argmin(meds))]
        np.testing.assert_array_equal(np.asarray(out.pt_desc[p]), expect)
    # untouched invalid point keeps its (zero) descriptor
    np.testing.assert_array_equal(np.asarray(out.pt_desc[n_pts + 1]), 0)


def test_distinctive_descriptors_restricted_matches_full(rng):
    """The per-keyframe restricted mode (what a keyframe insert uses) must
    reproduce the full-pool recomputation on the keyframe's own points and
    leave every other point's descriptor untouched."""
    cfg = small_cfg()
    state = empty_map(cfg)
    n_kf, n_pts = 5, 6
    descs = rng.integers(0, 2**32, (n_kf, n_pts, 8), dtype=np.uint32)
    state = state._replace(
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        kf_valid=state.kf_valid.at[:n_kf].set(True),
    )
    for k in range(n_kf):
        m = n_pts - k
        state = state._replace(
            kf_kp_valid=state.kf_kp_valid.at[k, :m].set(True),
            kf_obs_point=state.kf_obs_point.at[k, :m].set(jnp.arange(m)),
            kf_desc=state.kf_desc.at[k, :n_pts].set(jnp.asarray(descs[k])),
        )
    full = mapping.distinctive_descriptors(state, cfg)
    k = 1                                   # observes points 0..n_pts-2
    rest = mapping.distinctive_descriptors(state, cfg, kf=jnp.asarray(k))
    m = n_pts - k
    np.testing.assert_array_equal(np.asarray(rest.pt_desc[:m]),
                                  np.asarray(full.pt_desc[:m]))
    # points NOT observed by keyframe 1 keep their previous (zero) value
    np.testing.assert_array_equal(np.asarray(rest.pt_desc[m:]),
                                  np.asarray(state.pt_desc[m:]))


def test_distinctive_descriptors_same_kf_duplicates(rng):
    """Fusion can leave two features of ONE keyframe observing the same
    point; the selection must not corrupt (no zero/garbage descriptors)."""
    cfg = small_cfg()
    state = empty_map(cfg)
    d0 = rng.integers(0, 2**32, (8,), dtype=np.uint32)
    d1 = rng.integers(0, 2**32, (8,), dtype=np.uint32)
    state = state._replace(
        pt_valid=state.pt_valid.at[0].set(True),
        kf_valid=state.kf_valid.at[0].set(True),
        kf_kp_valid=state.kf_kp_valid.at[0, :2].set(True),
        # BOTH features of KF0 observe point 0
        kf_obs_point=state.kf_obs_point.at[0, 0].set(0).at[0, 1].set(0),
        kf_desc=state.kf_desc.at[0, 0].set(jnp.asarray(d0))
        .at[0, 1].set(jnp.asarray(d1)),
    )
    out = mapping.distinctive_descriptors(state, cfg)
    got = np.asarray(out.pt_desc[0])
    assert (got == d0).all() or (got == d1).all()


def test_local_ba_fixed_observer_ring_anchors_points(rng):
    """Window BA with noisy in-window observations must NOT walk shared
    points away from their out-of-window observers: the fixed observer ring
    (reference Optimizer.cc:820-838) adds those keyframes as fixed vertices
    whose clean observations anchor the points. Measured as point drift
    with vs without the ring."""
    import dataclasses

    cfg = small_cfg()
    cfg = cfg.replace(optim=dataclasses.replace(cfg.optim, pose_rounds=4))
    cam = cam_mod.camera_from_config(cfg.camera)
    state = empty_map(cfg)
    n_kf, n_pts = 8, 30
    pts_gt = np.stack([
        rng.uniform(-0.8, 0.8, n_pts),
        rng.uniform(-0.5, 0.5, n_pts),
        rng.uniform(2.5, 4.0, n_pts),
    ], axis=-1).astype(np.float32)
    state = state._replace(
        pt_xyz=state.pt_xyz.at[:n_pts].set(jnp.asarray(pts_gt)),
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        kf_valid=state.kf_valid.at[:n_kf].set(True),
        kf_frame_id=state.kf_frame_id.at[:n_kf].set(jnp.arange(n_kf)),
        kf_seq=state.kf_seq.at[:n_kf].set(jnp.arange(n_kf)),
        next_seq=jnp.asarray(n_kf, jnp.int32),
    )
    for k in range(n_kf):
        tcw = np.asarray([-0.1 * k, 0.0, 0.0], np.float32)
        p_cam = pts_gt + tcw            # Rcw = I
        uv = np.stack([
            cfg.camera.fx * p_cam[:, 0] / p_cam[:, 2] + cfg.camera.cx,
            cfg.camera.fy * p_cam[:, 1] / p_cam[:, 2] + cfg.camera.cy,
        ], axis=-1).astype(np.float32)
        if k >= 4:                      # window keyframes: noisy observations
            uv = uv + rng.normal(0, 1.5, uv.shape).astype(np.float32)
        state = state._replace(
            kf_tcw=state.kf_tcw.at[k].set(jnp.asarray(tcw)),
            kf_kp_uv=state.kf_kp_uv.at[k, :n_pts].set(jnp.asarray(uv)),
            kf_kp_valid=state.kf_kp_valid.at[k, :n_pts].set(True),
            kf_obs_point=state.kf_obs_point.at[k, :n_pts].set(
                jnp.arange(n_pts)
            ),
            pt_obs_kf=state.pt_obs_kf.at[:n_pts, k].set(True),
        )

    def drift(max_fixed):
        out, _ = mapping.bundle_adjust(
            state, jnp.asarray(n_kf - 1), cam, cfg,
            max_cams=4, max_pts=64, iters=10, max_fixed=max_fixed,
        )
        return float(np.mean(np.linalg.norm(
            np.asarray(out.pt_xyz[:n_pts]) - pts_gt, axis=-1
        )))

    d_no_ring = drift(0)
    d_ring = drift(4)
    # the ring's clean fixed observations must anchor the points (measured
    # 0.33 -> 0.043: without the ring the one-gauge window wanders freely
    # and drags every shared point with it)
    assert d_ring < 0.25 * d_no_ring, (d_ring, d_no_ring)
    assert d_ring < 0.08, d_ring


def test_gba_writeback_propagates_out_of_bucket_points():
    """Global-BA write-back with propagate=True must correct points the
    point bucket could not hold THROUGH their reference keyframe's pose
    delta (the reference's post-GBA propagation via mpRefKF,
    LoopClosing.cc:1190-1224) — on a capacity-bound map, no point may be
    left at its pre-correction position relative to its observers."""
    from orb_slam2_aruco_tpu.optim import ba as ba_mod
    from orb_slam2_aruco_tpu.geometry.lie import so3_exp

    cfg = small_cfg()
    state = empty_map(cfg)
    rng_ = np.random.default_rng(3)
    n_pts, n_kf = 8, 2
    pts = jnp.asarray(rng_.normal(0, 1, (n_pts, 3)) + [0, 0, 5.0])
    state = state._replace(
        pt_xyz=state.pt_xyz.at[:n_pts].set(pts),
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        pt_ref_kf=state.pt_ref_kf.at[:n_pts].set(
            jnp.arange(n_pts, dtype=jnp.int32) % n_kf
        ),
        kf_valid=state.kf_valid.at[:n_kf].set(True),
        pt_obs_kf=state.pt_obs_kf.at[:n_pts, :n_kf].set(True),
    )
    # point 5's stored ref slot is stale (culled KF slot 7) -> must fall
    # back to a live observer from the incidence matrix
    state = state._replace(pt_ref_kf=state.pt_ref_kf.at[5].set(7))
    # fabricated GBA result: both KFs move by a known rigid world transform
    # (world' = Rd @ world + td  =>  Tcw' = Tcw @ Td^-1)
    Rd = so3_exp(jnp.asarray([0.05, -0.03, 0.08]))
    td = jnp.asarray([0.3, -0.2, 0.1])
    K = state.K
    sel = jnp.arange(K, dtype=jnp.int32)
    sel_ok = state.kf_valid
    new_Rcw = jnp.einsum("kij,jl->kil", state.kf_Rcw, Rd.T)
    new_tcw = state.kf_tcw - jnp.einsum("kij,j->ki", new_Rcw, td)
    # the point bucket only holds points 0 and 1
    max_pts = 2
    pt_sel = jnp.asarray([0, 1], jnp.int32)
    pt_ok = jnp.asarray([True, True])
    moved_pts = (pts[:2] @ Rd.T) + td[None]
    E = K * state.kf_obs_point.shape[1]
    out = ba_mod.BAResult(
        Rcw=new_Rcw, tcw=new_tcw, points=moved_pts,
        Rwm=state.mk_Rwm, twm=state.mk_twm,
        chi2=jnp.zeros(()), edge_chi2=jnp.zeros((E,)),
        medge_chi2=jnp.zeros((1,)),
    )
    e_mask = jnp.zeros((E,), jnp.float32)
    out_state, _ = mapping.writeback_ba(
        state, out, e_mask, sel, sel_ok, pt_sel, pt_ok, cfg, propagate=True
    )
    want = (pts @ Rd.T) + td[None]
    got = np.asarray(out_state.pt_xyz[:n_pts])
    # in-bucket points written directly; out-of-bucket (incl. the stale-ref
    # one) corrected via their ref KF delta — all must land on the
    # transformed positions
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_marker_point_correlation_tags_and_recycles(rng):
    """MapPointRelatedAruco parity (reference LocalMapping.cc:469-485,
    MapPoint.cc:132): points whose feature lies inside an observed marker
    quad get a persistent pt_aruco tag at plane-update time. Like the
    reference (MapPointCulling has no forflag check, LocalMapping.cc:
    185-220) the tag does NOT shield a point from probation culling —
    marker protection lives at the keyframe level (cull_keyframes). A
    culled slot's tag must not leak to the slot's next occupant."""
    cfg = small_cfg()
    cam = cam_mod.camera_from_config(cfg.camera)
    state = empty_map(cfg)
    # KF 0 at origin; marker 0 observed with a quad at image center
    quad = jnp.asarray(
        [[300.0, 200.0], [340.0, 200.0], [340.0, 240.0], [300.0, 240.0]]
    )
    n_pts = 6
    # features 0..2 inside the quad, 3..5 outside
    uv = jnp.asarray([
        [320.0, 220.0], [310.0, 210.0], [330.0, 230.0],
        [100.0, 100.0], [500.0, 400.0], [50.0, 400.0],
    ])
    pts = jnp.asarray(rng.normal(0, 0.5, (n_pts, 3)) + [0, 0, 5.0])
    state = state._replace(
        kf_valid=state.kf_valid.at[0].set(True),
        kf_kp_uv=state.kf_kp_uv.at[0, :n_pts].set(uv),
        kf_kp_valid=state.kf_kp_valid.at[0, :n_pts].set(True),
        kf_obs_point=state.kf_obs_point.at[0, :n_pts].set(
            jnp.arange(n_pts, dtype=jnp.int32)
        ),
        pt_xyz=state.pt_xyz.at[:n_pts].set(pts),
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        pt_obs_kf=state.pt_obs_kf.at[:n_pts, 0].set(True),
        mk_valid=state.mk_valid.at[0].set(True),
        mk_id=state.mk_id.at[0].set(7),
        kf_mk_slot=state.kf_mk_slot.at[0, 0].set(0),
        kf_mk_uv=state.kf_mk_uv.at[0, 0].set(quad),
        kf_mk_valid=state.kf_mk_valid.at[0, 0].set(True),
    )
    out, _ = mapping.aruco_plane_update(state, jnp.asarray(0), cam, cfg)
    tags = np.asarray(out.pt_aruco[:n_pts])
    assert (tags[:3] == 0).all(), tags
    assert (tags[3:] == -1).all(), tags
    # probation culling applies regardless of the tag (reference parity)
    out = out._replace(
        pt_found=out.pt_found.at[:n_pts].set(0.0),
        pt_visible=out.pt_visible.at[:n_pts].set(10.0),
        pt_first_kf=out.pt_first_kf.at[:n_pts].set(0),
        kf_seq=out.kf_seq.at[0].set(0),
        next_seq=jnp.asarray(3, jnp.int32),
    )
    culled, n = mapping.cull_points(out)
    assert not np.asarray(culled.pt_valid[:n_pts]).any()
    # a recycled slot must start with a clean tag: allocate new points into
    # the freed slots and check pt_aruco resets to -1
    kf_new = 1
    culled = culled._replace(
        kf_valid=culled.kf_valid.at[kf_new].set(True),
    )
    good = jnp.zeros((cfg.orb.num_features,), bool).at[:2].set(True)
    xyz = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]),
                           (cfg.orb.num_features, 3))
    prev_idx = jnp.zeros((cfg.orb.num_features,), jnp.int32)
    nb = jnp.zeros((cfg.orb.num_features,), jnp.int32)
    alloc, n2 = mapping._allocate_points(
        culled, jnp.asarray(kf_new), nb, prev_idx, good, xyz, cam, cfg,
        max_new=8,
    )
    newly = np.asarray(alloc.pt_valid) & ~np.asarray(culled.pt_valid)
    assert newly.any()
    assert (np.asarray(alloc.pt_aruco)[newly] == -1).all()


def test_kf_cull_protects_loop_edge_keyframes(rng):
    """A keyframe holding a persistent loop edge is never culled (reference
    KeyFrame::SetErase keeps mbNotErase while mspLoopEdges is non-empty,
    KeyFrame.cc:527-548) — erasing it would drop the stored seam constraint
    from every later essential-graph optimization."""
    cfg = small_cfg()
    state = empty_map(cfg)
    n_kf, n_pts = 5, 30
    # every point observed by every KF => all KFs fully redundant
    state = state._replace(
        kf_valid=state.kf_valid.at[:n_kf].set(True),
        kf_frame_id=state.kf_frame_id.at[:n_kf].set(
            jnp.arange(n_kf, dtype=jnp.int32)
        ),
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        pt_obs_kf=state.pt_obs_kf.at[:n_pts, :n_kf].set(True),
        kf_obs_point=state.kf_obs_point.at[:n_kf, :n_pts].set(
            jnp.broadcast_to(jnp.arange(n_pts, dtype=jnp.int32),
                             (n_kf, n_pts))
        ),
        kf_kp_valid=state.kf_kp_valid.at[:n_kf, :n_pts].set(True),
    )
    keep = jnp.asarray(n_kf - 1)
    # without protection, some mid-chain KF is culled
    st_plain, victim_plain = mapping.cull_keyframes(state, keep, cfg)
    v0 = int(victim_plain)
    assert v0 >= 0
    # protect exactly that victim with a loop edge -> another KF is chosen
    state_prot = state._replace(
        loop_i=state.loop_i.at[0].set(v0),
        loop_j=state.loop_j.at[0].set(0),
        loop_valid=state.loop_valid.at[0].set(True),
    )
    _, victim2 = mapping.cull_keyframes(state_prot, keep, cfg)
    assert int(victim2) != v0
    assert int(victim2) != 0          # the other end is protected too


def test_gba_bucket_rotation_refines_all_points(rng):
    """With a live map larger than the GBA point bucket, rotating the bucket
    across slices (pt_offset) must leave EVERY point as well-refined as one
    full-map BA (the reference's GBA makes every point a vertex,
    Optimizer.cc:98-166); a fixed bucket provably leaves the tail noisy."""
    cfg = SlamConfig()
    cfg = cfg.replace(
        map=cfg.map.__class__(max_keyframes=8, max_points=512, max_markers=4),
        orb=cfg.orb.__class__(num_features=384),
    )
    cam = cam_mod.camera_from_config(cfg.camera)
    state = empty_map(cfg)
    n_kf, n_pts = 5, 384
    rng_ = np.random.default_rng(11)
    pts_true = np.stack([
        rng_.uniform(-1.5, 1.5, n_pts), rng_.uniform(-1.0, 1.0, n_pts),
        rng_.uniform(4.0, 6.0, n_pts),
    ], axis=-1).astype(np.float32)
    # cameras on a small lateral arc, all points in view
    from orb_slam2_aruco_tpu.geometry.lie import se3_apply, so3_exp

    for k in range(n_kf):
        R = so3_exp(jnp.asarray([0.0, 0.03 * (k - 2), 0.0]))
        t = jnp.asarray([0.15 * (k - 2), 0.0, 0.0])
        p = se3_apply(
            jnp.broadcast_to(R, (n_pts, 3, 3)),
            jnp.broadcast_to(t, (n_pts, 3)), jnp.asarray(pts_true),
        )
        uv = cam_mod.project(cam, p)
        vis = cam_mod.in_image(cam, uv) & (p[:, 2] > 0.1)
        state = state._replace(
            kf_Rcw=state.kf_Rcw.at[k].set(R),
            kf_tcw=state.kf_tcw.at[k].set(t),
            kf_valid=state.kf_valid.at[k].set(True),
            kf_frame_id=state.kf_frame_id.at[k].set(k),
            kf_kp_uv=state.kf_kp_uv.at[k, :n_pts].set(uv),
            kf_kp_valid=state.kf_kp_valid.at[k, :n_pts].set(vis),
            kf_obs_point=state.kf_obs_point.at[k, :n_pts].set(
                jnp.where(vis, jnp.arange(n_pts, dtype=jnp.int32), -1)
            ),
            pt_obs_kf=state.pt_obs_kf.at[
                jnp.where(vis, jnp.arange(n_pts), state.L), k
            ].set(True, mode="drop"),
        )
    # noisy stored points
    noise = rng_.normal(0, 0.05, (n_pts, 3)).astype(np.float32)
    state = state._replace(
        pt_xyz=state.pt_xyz.at[:n_pts].set(jnp.asarray(pts_true + noise)),
        pt_valid=state.pt_valid.at[:n_pts].set(True),
        pt_ref_kf=state.pt_ref_kf.at[:n_pts].set(0),
    )
    center = jnp.asarray(n_kf - 1)
    bucket = 128                     # << n_pts live

    def run_slices(offsets):
        st = state
        for off in offsets:
            st, _ = mapping.bundle_adjust(
                st, center, cam, cfg, max_cams=8, max_pts=bucket,
                iters=4, window_all=True, pt_offset=off,
            )
        return st

    # full-map BA reference
    st_full, _ = mapping.bundle_adjust(
        state, center, cam, cfg, max_cams=8, max_pts=512,
        iters=12, window_all=True,
    )
    err_full = np.linalg.norm(
        np.asarray(st_full.pt_xyz[:n_pts]) - pts_true, axis=-1
    )
    # rotated slices cover all slots
    st_rot = run_slices([0, bucket, 2 * bucket, 3 * bucket % cfg.map.max_points])
    err_rot = np.linalg.norm(
        np.asarray(st_rot.pt_xyz[:n_pts]) - pts_true, axis=-1
    )
    # fixed bucket leaves the tail unrefined
    st_fix = run_slices([0, 0, 0, 0])
    err_fix = np.linalg.norm(
        np.asarray(st_fix.pt_xyz[:n_pts]) - pts_true, axis=-1
    )
    # every rotated point matches the full-map BA quality
    assert float(np.max(err_rot)) < float(np.max(err_full)) + 5e-3, (
        err_rot.max(), err_full.max()
    )
    # the fixed bucket provably does NOT refine the tail
    assert float(np.max(err_fix)) > 0.03, err_fix.max()
