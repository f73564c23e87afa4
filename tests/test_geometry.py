"""Golden tests: camera model, triangulation, Horn Sim3, IPPE, two-view."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.config import CameraConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry import horn, ippe, triangulate, twoview
from orb_slam2_aruco_tpu.geometry import lie


def make_camera(dist=(0.1, -0.05, 0.001, 0.002, 0.0)):
    return cam_mod.camera_from_config(
        CameraConfig(fx=500.0, fy=505.0, cx=320.0, cy=240.0, dist=dist, width=640, height=480)
    )


def random_pose(rng, tmax=1.0):
    w = rng.normal(size=3) * 0.3
    R = lie.so3_exp(jnp.asarray(w, dtype=jnp.float32))
    t = jnp.asarray(rng.normal(size=3) * tmax, dtype=jnp.float32)
    return R, t


def test_distort_undistort_roundtrip(rng):
    cam = make_camera()
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, size=(256, 2)), dtype=jnp.float32)
    xd = cam_mod.distort_normalized(cam, xn)
    xu = cam_mod.undistort_normalized(cam, xd)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-5)


def test_project_unproject(rng):
    cam = make_camera(dist=(0, 0, 0, 0, 0))
    xyz = jnp.asarray(
        np.stack(
            [rng.uniform(-1, 1, 128), rng.uniform(-1, 1, 128), rng.uniform(2, 6, 128)],
            axis=-1,
        ),
        dtype=jnp.float32,
    )
    uv = cam_mod.project(cam, xyz)
    xn = cam_mod.pixels_to_normalized(cam, uv)
    np.testing.assert_allclose(
        np.asarray(xn), np.asarray(xyz[..., :2] / xyz[..., 2:]), atol=1e-5
    )


def test_triangulate_exact(rng):
    # ground-truth points seen by two cameras -> DLT recovers them
    n = 64
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 8, n)], axis=-1
    ).astype(np.float32)
    R1 = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)).astype(jnp.float32)
    t1 = jnp.zeros((n, 3), dtype=jnp.float32)
    R2s, t2s = random_pose(np.random.default_rng(1), tmax=0.5)
    R2 = jnp.broadcast_to(R2s, (n, 3, 3))
    t2 = jnp.broadcast_to(t2s + jnp.asarray([1.0, 0, 0]), (n, 3))
    p1 = jnp.asarray(xyz)
    p2 = lie.se3_apply(R2, t2, p1)
    xn1 = p1[..., :2] / p1[..., 2:]
    xn2 = p2[..., :2] / p2[..., 2:]
    rec = triangulate.triangulate_dlt(R1, t1, R2, t2, xn1, xn2)
    np.testing.assert_allclose(np.asarray(rec), xyz, atol=1e-3)


def test_horn_sim3_exact(rng):
    n = 32
    p1 = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    R, t = random_pose(rng)
    s_true = 1.7
    p2 = s_true * lie.se3_apply(jnp.broadcast_to(R, (n, 3, 3)), jnp.zeros(3), p1) + t
    s, Rh, th = horn.horn_sim3(p1, p2)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(Rh), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(th), np.asarray(t), atol=1e-3)


def test_horn_sim3_fix_scale(rng):
    n = 16
    p1 = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    R, t = random_pose(rng)
    p2 = lie.se3_apply(jnp.broadcast_to(R, (n, 3, 3)), jnp.broadcast_to(t, (n, 3)), p1)
    s, Rh, th = horn.horn_sim3(p1, p2, fix_scale=True)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(Rh), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(th), np.asarray(t), atol=1e-3)


def test_horn_sim3_weighted_ignores_outliers(rng):
    n = 24
    p1 = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    R, t = random_pose(rng)
    p2 = lie.se3_apply(jnp.broadcast_to(R, (n, 3, 3)), jnp.broadcast_to(t, (n, 3)), p1)
    p2 = p2.at[:4].add(10.0)  # corrupt 4 points
    w = jnp.ones(n).at[:4].set(0.0)
    s, Rh, th = horn.horn_sim3(p1, p2, w=w, fix_scale=True)
    np.testing.assert_allclose(np.asarray(Rh), np.asarray(R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(th), np.asarray(t), atol=1e-3)


def _random_marker_views(rng, n, side=0.165):
    """Render a square marker under random poses; return normalized corner
    observations + ground-truth (R, t)."""
    obj = np.asarray(ippe.square_object_points(side))
    Rs, ts, xns = [], [], []
    while len(Rs) < n:
        w = rng.normal(size=3) * 0.7
        R = np.asarray(lie.so3_exp(jnp.asarray(w, dtype=jnp.float32)))
        t = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), rng.uniform(0.6, 3.0)])
        p = obj @ R.T + t
        if np.any(p[:, 2] < 0.1):
            continue
        # require the marker plane to face the camera
        normal_cam = R @ np.array([0, 0, 1.0])
        if abs(normal_cam @ (t / np.linalg.norm(t))) < 0.2:
            continue
        xns.append(p[:, :2] / p[:, 2:])
        Rs.append(R)
        ts.append(t)
    return (
        jnp.asarray(np.stack(Rs), dtype=jnp.float32),
        jnp.asarray(np.stack(ts), dtype=jnp.float32),
        jnp.asarray(np.stack(xns), dtype=jnp.float32),
    )


def test_ippe_recovers_pose(rng):
    side = 0.165
    R_true, t_true, xn = _random_marker_views(rng, 64, side)
    res = ippe.ippe_square(side, xn)
    # best solution should match ground truth (rotation within ~1e-2)
    dR = np.einsum("nij,nkj->nik", np.asarray(res.R[:, 0]), np.asarray(R_true))
    ang = np.arccos(np.clip((np.trace(dR, axis1=1, axis2=2) - 1) / 2, -1, 1))
    assert np.quantile(ang, 0.9) < 0.02, ang.max()
    np.testing.assert_allclose(
        np.asarray(res.t[:, 0]), np.asarray(t_true), atol=0.02
    )
    # best-solution residual should be ~0 for exact observations
    assert float(jnp.max(res.err[:, 0])) < 1e-6


def test_ippe_ambiguity_ratio_small_for_clear_views(rng):
    # strongly tilted view -> unambiguous -> ratio << 1
    side = 0.165
    obj = np.asarray(ippe.square_object_points(side))
    R = np.asarray(lie.so3_exp(jnp.asarray([0.9, 0.0, 0.0], dtype=jnp.float32)))
    t = np.array([0.0, 0.0, 1.0])
    p = obj @ R.T + t
    xn = jnp.asarray((p[:, :2] / p[:, 2:])[None], dtype=jnp.float32)
    res = ippe.ippe_square(side, xn)
    assert float(res.ratio[0]) < 0.1


def test_fundamental_epipolar_constraint(rng):
    n = 64
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 8, n)], axis=-1
    ).astype(np.float32)
    R2, t2 = random_pose(rng, tmax=1.0)
    p1 = jnp.asarray(xyz)
    p2 = lie.se3_apply(
        jnp.broadcast_to(R2, (n, 3, 3)), jnp.broadcast_to(t2, (n, 3)), p1
    )
    x1 = p1[:, :2] / p1[:, 2:]
    x2 = p2[:, :2] / p2[:, 2:]
    F = twoview.fundamental_8pt(x1, x2)
    x1h = np.concatenate([np.asarray(x1), np.ones((n, 1))], axis=-1)
    x2h = np.concatenate([np.asarray(x2), np.ones((n, 1))], axis=-1)
    resid = np.abs(np.einsum("ni,ij,nj->n", x2h, np.asarray(F), x1h))
    assert resid.max() < 1e-4


def test_essential_decomposition_and_checkrt(rng):
    n = 100
    xyz = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 8, n)], axis=-1
    ).astype(np.float32)
    R2, t2 = random_pose(rng, tmax=0.0)
    t2 = jnp.asarray([0.8, 0.1, 0.05], dtype=jnp.float32)
    p1 = jnp.asarray(xyz)
    p2 = lie.se3_apply(jnp.broadcast_to(R2, (n, 3, 3)), jnp.broadcast_to(t2, (n, 3)), p1)
    x1 = p1[:, :2] / p1[:, 2:]
    x2 = p2[:, :2] / p2[:, 2:]
    F = twoview.fundamental_8pt(x1, x2)
    K = jnp.eye(3)
    E = twoview.essential_from_fundamental(F, K)
    Rs, ts = twoview.decompose_E(E)
    mask = jnp.ones(n)
    n_good, good, _, _ = twoview.check_rt(
        Rs, ts, jnp.broadcast_to(x1, (4, n, 2)), jnp.broadcast_to(x2, (4, n, 2)),
        jnp.broadcast_to(mask, (4, n)),
    )
    best = int(jnp.argmax(n_good))
    assert int(n_good[best]) > 0.9 * n
    # recovered R should match ground truth
    dR = np.asarray(Rs[best]) @ np.asarray(R2).T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 1e-2
    # t up to scale
    tn = np.asarray(ts[best])
    t_gt = np.asarray(t2) / np.linalg.norm(np.asarray(t2))
    assert min(np.linalg.norm(tn - t_gt), np.linalg.norm(tn + t_gt)) < 1e-2


def test_homography_planar_decomposition(rng):
    # points on a plane -> H maps view1 to view2; decomposition contains truth
    n = 60
    xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
    xyz = np.concatenate([xy, np.zeros((n, 1), np.float32)], axis=-1)
    # camera 1 looking at plane from z=-3 (plane in front)
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.05, 0.0], dtype=jnp.float32)))
    t1 = np.array([0.0, 0.0, 3.0], np.float32)
    R2 = np.asarray(lie.so3_exp(jnp.asarray([-0.15, 0.2, 0.1], dtype=jnp.float32)))
    t2 = np.array([0.4, -0.2, 3.2], np.float32)
    p1 = xyz @ R1.T + t1
    p2 = xyz @ R2.T + t2
    x1 = jnp.asarray(p1[:, :2] / p1[:, 2:])
    x2 = jnp.asarray(p2[:, :2] / p2[:, 2:])
    H = twoview.homography_dlt(x1, x2)
    err = np.asarray(twoview._apply_h(H, x1)) - np.asarray(x2)
    assert np.abs(err).max() < 1e-4
    Rs, ts = twoview.decompose_H(H, jnp.eye(3))
    # relative pose cam1 -> cam2
    R_rel = R2 @ R1.T
    angs = []
    for i in range(8):
        dR = np.asarray(Rs[i]) @ R_rel.T
        angs.append(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert min(angs) < 5e-2, angs
