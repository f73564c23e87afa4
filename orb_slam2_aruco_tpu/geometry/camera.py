"""Pinhole camera model with radial-tangential distortion.

Replaces cv::projectPoints / cv::undistortPoints usage in the reference
(src/Frame.cc:357-416). All ops batched over leading dims, jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig


class Camera(NamedTuple):
    """Device-resident intrinsics. dist = (k1, k2, p1, p2, k3)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5]
    width: int
    height: int

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], axis=-1),
                jnp.stack([z, self.fy, self.cy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )


def camera_from_config(cfg: CameraConfig) -> Camera:
    return Camera(
        fx=jnp.float32(cfg.fx),
        fy=jnp.float32(cfg.fy),
        cx=jnp.float32(cfg.cx),
        cy=jnp.float32(cfg.cy),
        dist=jnp.asarray(cfg.dist, dtype=jnp.float32),
        width=cfg.width,
        height=cfg.height,
    )


def distort_normalized(cam: Camera, xn):
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd, iters: int = 8):
    """Invert distortion by fixed-point iteration (matches cv::undistortPoints
    semantics). [..., 2] -> [..., 2]."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x0, y0 = xd[..., 0], xd[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x, y], axis=-1)


def project(cam: Camera, xyz_cam, distort: bool = False):
    """Camera-frame 3D points [..., 3] -> pixels [..., 2].

    By default projects without distortion (the pipeline works on undistorted
    keypoints, like the reference after Frame::UndistortKeyPoints)."""
    z = xyz_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = xyz_cam[..., :2] / z_safe[..., None]
    if distort:
        xn = distort_normalized(cam, xn)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pixels_to_normalized(cam: Camera, uv, undistort: bool = False):
    """Pixels [..., 2] -> normalized camera coords [..., 2]."""
    xn = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    if undistort:
        xn = undistort_normalized(cam, xn)
    return xn


def undistort_pixels(cam: Camera, uv):
    """Distorted pixels -> undistorted pixels (Frame::UndistortKeyPoints)."""
    xn = pixels_to_normalized(cam, uv, undistort=True)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def in_image(cam: Camera, uv, margin: float = 0.0):
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
