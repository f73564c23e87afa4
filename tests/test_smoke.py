"""Pre-commit smoke gate (VERDICT round-3 item 8).

ONE fast end-to-end exercise of the engine — init + tracking + keyframe
insertion + checkpoint roundtrip + localization — that MUST run before
every snapshot:

    python -m pytest tests/ -q -m smoke     (~3 min on CPU, compile-bound)

Round 3 shipped a tree where every tracking path crashed at trace time;
this gate exists so that cannot happen again. Keep it cheap: the point is
that it always runs, not that it is exhaustive (the full suite covers
depth).
"""

import numpy as np
import pytest

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic, trajectory
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState


@pytest.mark.smoke
def test_smoke_track_insert_checkpoint_localize(tmp_path):
    camc = CameraConfig(
        fx=300.0, fy=300.0, cx=160.0, cy=120.0, dist=(0, 0, 0, 0, 0),
        width=320, height=240,
    )
    cfg = SlamConfig().replace(camera=camc)
    cfg = cfg.replace(
        orb=cfg.orb.__class__(num_features=300),
        map=cfg.map.__class__(max_keyframes=16, max_points=2048,
                              max_markers=8),
    )
    world = synthetic.build_world(
        [3, 17, 42, 99], px_per_m=700.0, spacing=0.45, grid_cols=2
    )
    n = 12
    poses = [
        synthetic.look_at_plane_pose(
            (0.3 + 0.4 * i / n, 0.22), 1.3,
            yaw=0.1 * np.sin(2 * np.pi * i / n), pitch=0.05,
        )
        for i in range(n)
    ]
    imgs = [synthetic.render_view(world, camc, R, t) for R, t in poses]

    # SLAM pass: init, track, insert keyframes
    slam = SlamSystem(cfg)
    est = [slam.track_monocular(img, ts=i / 30.0)
           for i, img in enumerate(imgs)]
    slam.flush()
    assert slam.state is TrackingState.OK
    assert slam.n_keyframes >= 2
    assert int(slam.map.num_points()) > 50
    n_tracked = sum(p is not None for p in est)
    assert n_tracked >= n - 6, n_tracked
    est_R = [p[0] for p in est if p is not None]
    est_t = [p[1] for p in est if p is not None]
    gt = [poses[i] for i, p in enumerate(est) if p is not None]
    est_c = trajectory.camera_centers(est_R, est_t)
    gt_c = trajectory.camera_centers([g[0] for g in gt], [g[1] for g in gt])
    assert trajectory.ate_rmse(est_c, gt_c, align=True,
                               with_scale=False) < 0.05

    # checkpoint roundtrip + localization-mode tracking on the loaded map
    path = str(tmp_path / "m.npz")
    slam.save_map(path)
    slam2 = SlamSystem(cfg)
    slam2.load_map(path)
    slam2.activate_localization_mode()
    p = slam2.track_monocular(imgs[n // 2], ts=99.0)
    assert p is not None
