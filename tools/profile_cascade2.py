"""A/B the localization chunk: sequential cascade vs two-stage, plus the
isolated stage-1 scan and stage-2 vmap, to see where the ~6 ms/frame of
non-frontend time actually goes. Run: python -m tools.profile_cascade2"""

import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

B = 16
camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
cfg_seq = cfg.replace(
    tracking=dataclasses.replace(cfg.tracking, loc_two_stage=False))
assert cfg.tracking.loc_two_stage

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
assert slam.state is TrackingState.OK
imgs = jnp.stack([jnp.asarray(f) for f in frames_np])
jax.block_until_ready(imgs)
cam, st, lf = slam.cam, slam.map, slam.last_frame


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


def tb(c):
    @jax.jit
    def f():
        ctrls, _ = tracking.track_batch(
            st, imgs, slam.last_pose[0], slam.last_pose[1],
            jnp.eye(3), jnp.zeros(3), jnp.asarray(False),
            lf.kp_uv, lf.desc, slam.last_obs, lf.kp_valid, lf.kp_octave,
            lf.kp_angle, jnp.asarray(slam.ref_kf), cam, c,
        )
        return ctrls
    return f


@jax.jit
def frames_only():
    fr = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)
    return fr.ctrl


@jax.jit
def stage1_only():
    fr = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)

    def seed_step(carry, frame):
        Rl, tl = carry
        tr, slots, old, ok_a, need_ref = tracking._cascade_seed(
            st, frame, Rl, tl, Rl, tl,
            lf.kp_uv, lf.desc, slam.last_obs, lf.kp_valid, lf.kp_octave,
            lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg,
        )
        return (tr.Rcw, tr.tcw), tr.n_inliers

    _, out = jax.lax.scan(seed_step, slam.last_pose, fr)
    return out


@jax.jit
def stage2_only():
    fr = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)
    Rb = jnp.broadcast_to(slam.last_pose[0], (B, 3, 3))
    tb_ = jnp.broadcast_to(slam.last_pose[1], (B, 3))

    def one(frame, R0, t0):
        slots = tracking.bind_markers(st, frame)
        old = tracking.old_marker_flags(st, slots,
                                        cfg.loop.min_kfs_between_loops)
        pt_local, _ = tracking.local_point_mask(
            st, jnp.full_like(frame.kp_octave, -1),
            cfg.tracking.max_local_keyframes)
        (tr2, _) = tracking.track_local_map(
            st, frame, slots, R0, t0, jnp.full_like(frame.kp_octave, -1),
            cam, cfg, old=old, pt_candidates=pt_local)
        return tr2.n_inliers

    return jax.vmap(one)(fr, Rb, tb_)


timeit("frontend only", frames_only)
timeit("frontend+stage1 scan", stage1_only)
timeit("frontend+stage2 vmap", stage2_only)
timeit("track_batch two-stage", tb(cfg))
timeit("track_batch sequential", tb(cfg_seq))
