"""Trajectory export + ATE evaluation.

Replaces System::SaveKeyFrameTrajectoryTUM (reference src/System.cc:287-321)
and the examples' `id tx ty tz qx qy qz qw` writer (mono_cvcam.cc:236-266),
plus the offline ATE comparison the reference ecosystem does with external
scripts (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from orb_slam2_aruco_tpu.geometry import lie

import jax.numpy as jnp


def save_tum(path: str, timestamps, Rcw_list, tcw_list):
    """TUM format: `t tx ty tz qx qy qz qw` of the camera-to-world pose."""
    lines = []
    for ts, Rcw, tcw in zip(timestamps, Rcw_list, tcw_list):
        Rwc = np.asarray(Rcw).T
        c = -Rwc @ np.asarray(tcw)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(Rwc)))  # (w, x, y, z)
        lines.append(
            f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
            f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_tum(path: str):
    data = np.loadtxt(path)
    ts = data[:, 0]
    centers = data[:, 1:4]
    quats = data[:, 4:8]  # (x, y, z, w)
    return ts, centers, quats


def camera_centers(Rcw_list, tcw_list) -> np.ndarray:
    cs = []
    for Rcw, tcw in zip(Rcw_list, tcw_list):
        cs.append(-np.asarray(Rcw).T @ np.asarray(tcw))
    return np.stack(cs)


def ate_rmse(est_centers: np.ndarray, gt_centers: np.ndarray,
             align: bool = True, with_scale: bool = True) -> float:
    """Absolute trajectory error after optional Sim3/SE3 alignment (standard
    TUM evaluation protocol; the reference's external evaluation does the
    same)."""
    est = np.asarray(est_centers, dtype=np.float64)
    gt = np.asarray(gt_centers, dtype=np.float64)
    assert est.shape == gt.shape
    if align:
        from orb_slam2_aruco_tpu.geometry.horn import horn_sim3

        s, R, t = horn_sim3(
            jnp.asarray(est, dtype=jnp.float32),
            jnp.asarray(gt, dtype=jnp.float32),
            fix_scale=not with_scale,
        )
        est = (
            float(s) * (np.asarray(R, dtype=np.float64) @ est.T).T
            + np.asarray(t, dtype=np.float64)
        )
    err = np.linalg.norm(est - gt, axis=-1)
    return float(np.sqrt(np.mean(err**2)))


def save_kitti(path: str, Rcw_list, tcw_list):
    """KITTI format: one 3x4 camera-to-world matrix per line, row-major
    (System::SaveTrajectoryKITTI, reference src/System.cc:323-376)."""
    lines = []
    for Rcw, tcw in zip(Rcw_list, tcw_list):
        Rwc = np.asarray(Rcw).T
        c = -Rwc @ np.asarray(tcw)
        P = np.concatenate([Rwc, c[:, None]], axis=1)
        lines.append(" ".join(f"{v:.9e}" for v in P.reshape(-1)))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
