"""Retrieval robustness (VERDICT round-1 item 9): recall/precision of
loop/reloc candidate selection under perceptual aliasing (a REPEATED texture
tile) and illumination change, with the covisible-group accumulated scoring
of KeyFrameDatabase.cc:76-197."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState
from orb_slam2_aruco_tpu.worldmap import retrieval
from orb_slam2_aruco_tpu.worldmap.covisibility import covisibility_matrix


def _aliased_world():
    """World whose background texture REPEATS with a 0.6 m period: views
    0.6 m apart look near-identical away from the markers."""
    world = synthetic.build_world(
        [3, 17, 42, 99], px_per_m=600.0, spacing=0.45, grid_cols=2,
        extent_margin=1.8, texture_noise=25.0, seed=4,
    )
    tex = np.asarray(world.texture)
    period = int(0.6 * 600.0)
    tile = tex[:, :period].copy()
    reps = -(-tex.shape[1] // period)
    tex[:] = np.tile(tile, (1, reps))[:, : tex.shape[1]]
    return world


@pytest.fixture(scope="module")
def aliased_map():
    camc = CameraConfig(fx=300.0, fy=300.0, cx=160.0, cy=120.0,
                        dist=(0, 0, 0, 0, 0), width=320, height=240)
    cfg = SlamConfig().replace(camera=camc)
    cfg = cfg.replace(
        orb=cfg.orb.__class__(num_features=500),
        tracking=dataclasses.replace(cfg.tracking, min_frames_between_kf=2,
                                     kf_ref_ratio=2.0),
        map=cfg.map.__class__(max_keyframes=32, max_points=4096,
                              max_markers=16),
    )
    world = _aliased_world()
    # sweep stays over the marker region (tracking needs SOME non-repeated
    # structure — on pure periodic texture the ratio test correctly kills
    # every match); the background still aliases with a 0.6 m period, which
    # is what the retrieval queries must disambiguate
    n = 24
    poses = [
        synthetic.look_at_plane_pose((0.05 + 0.8 * i / n, 0.22), 1.2,
                                     pitch=0.03)
        for i in range(n)
    ]
    imgs = [synthetic.render_view(world, camc, R, t) for R, t in poses]
    slam = SlamSystem(cfg)
    for i, img in enumerate(imgs):
        slam.track_monocular(img, ts=i / 30.0)
    assert slam.state is TrackingState.OK
    assert slam.n_keyframes >= 8
    return slam, world, poses, imgs, cfg


def _gt_center(poses, i):
    R, t = poses[i]
    return -np.asarray(R).T @ np.asarray(t)


def _kf_gt_centers(state, poses):
    """Ground-truth camera center of each keyframe's SOURCE FRAME — the SLAM
    world frame is anchored at the init view, so distances must be measured
    in the synthetic ground-truth frame via kf_frame_id."""
    fids = np.asarray(state.kf_frame_id)
    K = fids.shape[0]
    out = np.full((K, 3), 1e9)
    for k in range(K):
        if 0 <= fids[k] < len(poses):
            out[k] = _gt_center(poses, int(fids[k]))
    return out


def test_reloc_recall_under_lighting_change(aliased_map):
    """Query every frame re-rendered at +-30% exposure: the top accepted
    relocalization candidate must be a keyframe within 0.45 m of the true
    camera for >= 70% of queries, despite the repeated texture."""
    slam, world, poses, imgs, cfg = aliased_map
    centers = _kf_gt_centers(slam.map, poses)
    valid = np.asarray(slam.map.kf_valid)
    hits = total = 0
    for i in range(0, len(imgs), 3):
        gain = 0.7 if (i // 3) % 2 == 0 else 1.3
        img = np.clip(np.asarray(imgs[i]) * gain, 0, 255)
        frame = make_frame(jnp.asarray(img), slam.cam, cfg)
        idx, vals, keep = tracking.reloc_candidates(slam.map, frame, cfg)
        idx = np.asarray(idx)
        keep = np.asarray(keep)
        if not keep.any():
            total += 1
            continue
        k = int(idx[np.argmax(keep)])
        if not valid[k]:
            total += 1
            continue
        c_true = _gt_center(poses, i)
        hits += float(np.linalg.norm(centers[k] - c_true)) < 0.45
        total += 1
    assert total >= 7
    assert hits / total >= 0.7, (hits, total)


def test_grouped_scoring_beats_flat_on_aliased_texture(aliased_map):
    """Covisible-group accumulation must not be WORSE than flat top-k on the
    aliased wall, and the shared-word gate must prune at least as well:
    measured as mean distance error of the top candidate over all queries."""
    slam, world, poses, imgs, cfg = aliased_map
    centers = _kf_gt_centers(slam.map, poses)
    W = covisibility_matrix(slam.map).astype(jnp.float32)
    err_flat, err_grp = [], []
    for i in range(1, len(imgs), 3):
        frame = make_frame(jnp.asarray(imgs[i]), slam.cam, cfg)
        c_true = _gt_center(poses, i)
        fi, fv, fk = retrieval.detect_candidates(
            frame.bow, slam.map.kf_bow, slam.map.kf_valid,
            exclude_mask=jnp.zeros_like(slam.map.kf_valid),
            min_score=0.0, max_candidates=4,
        )
        gi, gv, gk = retrieval.detect_candidates_grouped(
            frame.bow, slam.map.kf_bow, slam.map.kf_valid, covis_w=W,
            exclude_mask=jnp.zeros_like(slam.map.kf_valid),
            min_score=0.0, max_candidates=4,
        )
        if bool(np.asarray(fk)[0]):
            err_flat.append(np.linalg.norm(
                centers[int(np.asarray(fi)[0])] - c_true))
        if bool(np.asarray(gk)[0]):
            err_grp.append(np.linalg.norm(
                centers[int(np.asarray(gi)[0])] - c_true))
    assert len(err_grp) >= 5
    assert np.mean(err_grp) <= np.mean(err_flat) + 0.05, (
        np.mean(err_grp), np.mean(err_flat))
