"""Chunk-granularity ablation of the localization hot path.

Times BATCHED variants (16 frames per dispatch, one sync per call) so the
relay round trip (~25 ms) amortizes to ~1.5 ms/frame and per-frame numbers
are trustworthy, unlike per-call timings in profile_tpu.py. Prints a
ms/frame table: full track_batch, the vmapped frontend alone, frontend
sub-stages (ORB-only, ArUco-only with/without the Pallas CC kernel), and
the sequential pose-cascade remainder.

Run from the repo root: python -m tools.profile_chunk
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

B = 16
camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
acfg = cfg.aruco

world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
frames_np = []
for i in range(B):
    R, t = synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0,
                                        yaw=0.05, pitch=0.04)
    frames_np.append(np.clip(synthetic.render_view(world, camc, R, t), 0,
                             255).astype(np.uint8))

slam = SlamSystem(cfg)
for i, f in enumerate(frames_np):
    slam.track_monocular(f, ts=i / 30.0)
slam.flush()
assert slam.state is TrackingState.OK, slam.state

imgs = jnp.stack([jnp.asarray(f) for f in frames_np])
jax.block_until_ready(imgs)
cam = slam.cam
st = slam.map


def timeit(name, fn, n=6):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1000
    print(f"{name:34s}: {ms:7.1f} ms/chunk = {ms / B:5.2f} ms/frame",
          flush=True)
    return ms


@jax.jit
def v_null():
    return imgs.sum()


@jax.jit
def v_frontend():
    fr = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)
    return fr.ctrl


cfg_nopallas = cfg.replace(aruco=acfg.__class__(
    detect_downsample=2, use_pallas_cc=False))


@jax.jit
def v_frontend_nopallas():
    fr = jax.vmap(lambda im: make_frame(im, cam, cfg_nopallas))(imgs)
    return fr.ctrl


@jax.jit
def v_detect():
    def one(im):
        g = im.astype(jnp.float32)
        det = detector.detect_markers(
            g, acfg.dictionary, max_quads=acfg.max_quad_candidates,
            adaptive_win=acfg.adaptive_thresh_win,
            adaptive_c=acfg.adaptive_thresh_c,
            min_area=acfg.min_quad_side_px ** 2,
            cell_px=acfg.warp_cell_px, cc_iters=acfg.cc_iters,
            downsample=acfg.detect_downsample, refine=True,
            use_pallas_cc=acfg.use_pallas_cc)
        return det.corners.sum() + det.ids.sum()
    return jax.vmap(one)(imgs)


@jax.jit
def v_track_batch():
    lf = slam.last_frame
    ctrls, _ = tracking.track_batch(
        st, imgs, slam.last_pose[0], slam.last_pose[1],
        jnp.eye(3), jnp.zeros(3), jnp.asarray(False),
        lf.kp_uv, lf.desc, slam.last_obs, lf.kp_valid, lf.kp_octave,
        lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg,
    )
    return ctrls


null = timeit("null (dispatch+sync)", v_null)
full = timeit("track_batch (frontend+cascade)", v_track_batch)
fe = timeit("frontend vmap (ORB+ArUco+BoW)", v_frontend)
det = timeit("ArUco detect only (pallas on)", v_detect)
fe2 = timeit("frontend (pallas CC off)", v_frontend_nopallas)
print("-" * 62)
print(f"{'cascade (track_batch - frontend)':34s}: {(full - fe) / B:5.2f} "
      f"ms/frame")
print(f"{'ORB+BoW (frontend - detect)':34s}: {(fe - det) / B:5.2f} ms/frame")
print(f"{'pallas CC saving':34s}: {(fe2 - fe) / B:5.2f} ms/frame")
