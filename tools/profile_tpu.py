"""Per-stage TPU timing table for the tracking hot path (VERDICT item 1).

Each stage is one jitted program, timed wall-clock over several dispatches;
the first column includes the relay round trip (~23 ms in this environment,
measured by the null-dispatch row) — subtract it to get on-chip time.

Run: python tools/profile_tpu.py  (takes ~15-30 min: each new jit program
pays the remote-compile relay, CLAUDE.md "Environment gotchas").
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.optim import pose_opt
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
cam = cam_mod.camera_from_config(camc)
acfg = cfg.aruco

world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
n_frames = 8
poses = []
for i in range(n_frames):
    x = 0.5 + 0.8 * i / 16
    poses.append(synthetic.look_at_plane_pose((x, 0.3), 2.0, yaw=0.05, pitch=0.04))
imgs = [jax.device_put(np.clip(synthetic.render_view(world, camc, R, t), 0, 255
                               ).astype(np.uint8)) for R, t in poses]
jax.block_until_ready(imgs)


def _ds(binary, ds=2):
    h0, w0 = binary.shape
    blocks = binary[:(h0 // ds) * ds, :(w0 // ds) * ds].reshape(
        h0 // ds, ds, w0 // ds, ds)
    return blocks.sum(axis=(1, 3)) * 2 >= ds * ds


@jax.jit
def null_op(img):
    return img.sum()


@jax.jit
def s_thresh_ds(img):
    g = img.astype(jnp.float32)
    b = _ds(detector.adaptive_threshold(g, acfg.adaptive_thresh_win,
                                        acfg.adaptive_thresh_c))
    return b.sum()


@jax.jit
def s_cc4(img):
    g = img.astype(jnp.float32)
    b = _ds(detector.adaptive_threshold(g, acfg.adaptive_thresh_win,
                                        acfg.adaptive_thresh_c))
    lab = detector.connected_components(b, iters=0, rounds=4)
    return lab.sum()


@jax.jit
def s_cc2(img):
    g = img.astype(jnp.float32)
    b = _ds(detector.adaptive_threshold(g, acfg.adaptive_thresh_win,
                                        acfg.adaptive_thresh_c))
    lab = detector.connected_components(b, iters=0, rounds=2)
    return lab.sum()


@jax.jit
def s_areas(img):
    """thresh + cc4 + the sort-based area/top-k stage (no membership stats)."""
    import math
    g = img.astype(jnp.float32)
    b = _ds(detector.adaptive_threshold(g, acfg.adaptive_thresh_win,
                                        acfg.adaptive_thresh_c))
    lab2 = detector.connected_components(b, iters=0, rounds=4)
    h, w = b.shape
    P = h * w
    astride = max(1, int(round(math.sqrt(P / 32768.0)))) if P > 40000 else 1
    sub = lab2[::astride, ::astride].reshape(-1)
    ss = jnp.sort(sub)
    left = jnp.searchsorted(ss, ss, side="left")
    right = jnp.searchsorted(ss, ss, side="right")
    area_run = (right - left).astype(jnp.float32)
    score = jnp.where((left == jnp.arange(ss.shape[0])) & (ss < P), area_run, 0.0)
    vals, pos = jax.lax.top_k(score, acfg.max_quad_candidates)
    return vals.sum() + ss[pos].sum()


@jax.jit
def s_quads(img):
    g = img.astype(jnp.float32)
    b = _ds(detector.adaptive_threshold(g, acfg.adaptive_thresh_win,
                                        acfg.adaptive_thresh_c))
    q, v, ok = detector.quad_candidates(
        b, acfg.max_quad_candidates, min_area=acfg.min_quad_side_px**2 / 4,
        cc_iters=acfg.cc_iters)
    return q.sum() + v.sum()


@jax.jit
def s_decode(img):
    """full detect minus proposal: warp + decode + dedup (refine=False)."""
    g = img.astype(jnp.float32)
    det = detector.detect_markers(
        g, acfg.dictionary, max_quads=acfg.max_quad_candidates,
        adaptive_win=acfg.adaptive_thresh_win, adaptive_c=acfg.adaptive_thresh_c,
        min_area=acfg.min_quad_side_px**2, cell_px=acfg.warp_cell_px,
        cc_iters=acfg.cc_iters, downsample=2, refine=False,
        use_pallas_cc=False)
    return det.corners.sum() + det.ids.sum()


# ---- pose opt + tracking stages (need a built map) -------------------------
slam = SlamSystem(cfg)
for i, img in enumerate(imgs):
    slam.track_monocular(img, ts=i / 30.0)
assert slam.state is TrackingState.OK, slam.state
st = slam.map
frame0 = make_frame(imgs[0], cam, cfg)
jax.block_until_ready(frame0)
Rl, tl = slam.last_pose
lf = slam.last_frame
lobs = slam.last_obs

key = jax.random.PRNGKey(0)
N = 1200
pts_w = jax.random.normal(key, (N, 3)) * 2.0 + jnp.array([0.0, 0.0, 3.0])
uvs = cam_mod.project(cam, pts_w)
mask = (jnp.arange(N) % 5) != 0
inv_s2 = jnp.ones((N,))
mk_c = jax.random.normal(key, (8, 4, 3)) + jnp.array([0.0, 0.0, 3.0])
mk_uv = cam_mod.project(cam, mk_c.reshape(-1, 3)).reshape(8, 4, 2)
mk_m = jnp.ones((8,), bool)


@jax.jit
def s_pose_opt(img):
    r = pose_opt.optimize_pose(
        jnp.eye(3), jnp.zeros(3), cam, pts_w, uvs, mask, inv_s2,
        marker_corners_w=mk_c, marker_uv=mk_uv, marker_mask=mk_m,
        rounds=4, iters_per_round=10)
    return r.tcw.sum() + img[0, 0].astype(jnp.float32)


@jax.jit
def s_pose_opt_short(img):
    r = pose_opt.optimize_pose(
        jnp.eye(3), jnp.zeros(3), cam, pts_w, uvs, mask, inv_s2,
        marker_corners_w=mk_c, marker_uv=mk_uv, marker_mask=mk_m,
        rounds=3, iters_per_round=4)
    return r.tcw.sum() + img[0, 0].astype(jnp.float32)


@jax.jit
def s_track_local(img):
    frame = make_frame(img, cam, cfg)
    slots = tracking.bind_markers(st, frame)
    (tr, (vis, found)) = tracking.track_local_map(
        st, frame, slots, Rl, tl, jnp.full_like(frame.kp_octave, -1),
        cam, cfg)
    return tr.ctrl if hasattr(tr, 'ctrl') else tr.tcw.sum()


@jax.jit
def s_track_full(img):
    frame = make_frame(img, cam, cfg)
    out = tracking.track_full(
        st, frame, Rl, tl, Rl, tl,
        lf.kp_uv, lf.desc, lobs, lf.kp_valid, lf.kp_octave, lf.kp_angle,
        jnp.asarray(slam.ref_kf), cam, cfg)
    return out.ctrl


@jax.jit
def s_make_frame(img):
    f = make_frame(img, cam, cfg)
    return f.ctrl


def bench(name, fn, n=10):
    t_c0 = time.perf_counter()
    jax.block_until_ready(fn(imgs[0]))
    t_compile = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for k in range(n):
        jax.block_until_ready(fn(imgs[k % n_frames]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:24s}: {dt:7.1f} ms/call   (compile {t_compile:.0f}s)",
          flush=True)


bench("null", null_op)
bench("thresh+ds", s_thresh_ds)
bench("cc rounds=2", s_cc2)
bench("cc rounds=4", s_cc4)
bench("cc4+areas(sort)", s_areas)
bench("quad_candidates", s_quads)
bench("full detect no refine", s_decode)
bench("pose_opt 4x10", s_pose_opt)
bench("pose_opt 3x4", s_pose_opt_short)
bench("make_frame", s_make_frame)
bench("track_local_map", s_track_local)
bench("track_full", s_track_full)
