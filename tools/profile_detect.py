"""Batched substage timing of the ArUco detector with the Pallas CC path on
(the configuration the real frontend runs). Run: python -m tools.profile_detect"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.ops.aruco.detector import (
    adaptive_threshold, decode_quads, quad_candidates_fused,
    refine_corners_lines)

B = 16
camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
acfg = cfg.aruco.__class__(detect_downsample=2)
world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
frames = []
for i in range(B):
    R, t = synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0,
                                        yaw=0.05, pitch=0.04)
    frames.append(np.clip(synthetic.render_view(world, camc, R, t), 0,
                          255).astype(np.uint8))
imgs = jnp.stack([jnp.asarray(f) for f in frames])
jax.block_until_ready(imgs)
ds = acfg.detect_downsample


def stage(upto):
    def one(im):
        g = im.astype(jnp.float32)
        binary = adaptive_threshold(g, acfg.adaptive_thresh_win,
                                    acfg.adaptive_thresh_c)
        if upto == "thresh":
            return binary.sum()
        h0, w0 = binary.shape
        blocks = binary[:(h0 // ds) * ds, :(w0 // ds) * ds].reshape(
            h0 // ds, ds, w0 // ds, ds)
        binary_s = blocks.sum(axis=(1, 3)) * 2 >= ds * ds
        quads, _, qvalid = quad_candidates_fused(
            binary_s, acfg.max_quad_candidates,
            min_area=acfg.min_quad_side_px ** 2 / (ds * ds))
        quads = quads * float(ds) + (ds - 1) / 2.0
        if upto == "quads":
            return quads.sum()
        det = decode_quads(g, quads, qvalid, acfg.dictionary,
                           cell_px=acfg.warp_cell_px)
        if upto == "decode":
            return det.corners.sum() + det.ids.sum()
        det = det._replace(corners=refine_corners_lines(g, det.corners))
        return det.corners.sum() + det.ids.sum()

    return jax.jit(lambda: jax.vmap(one)(imgs))


def timeit(name, fn, n=6):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1000
    print(f"{name:22s}: {ms:7.1f} ms/chunk = {ms / B:5.2f} ms/frame",
          flush=True)


timeit("thresh", stage("thresh"))
timeit("thresh+pallasCC+quads", stage("quads"))
timeit("+decode", stage("decode"))
timeit("+refine (full)", stage("full"))
