import time
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))

world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0, spacing=0.6, grid_cols=4, marker_size=0.165)
n_frames = 16
poses = []
for i in range(n_frames):
    x = 0.5 + 0.8 * i / n_frames
    yaw = 0.1 * np.sin(2 * np.pi * i / n_frames)
    poses.append(synthetic.look_at_plane_pose((x, 0.3), 2.0, yaw=yaw, pitch=0.04))
frames = [synthetic.render_view(world, camc, R, t) for R, t in poses]
frames_dev = [jax.device_put(np.clip(f, 0, 255).astype(np.uint8)) for f in frames]
jax.block_until_ready(frames_dev)

slam = SlamSystem(cfg)
for i, img in enumerate(frames_dev):
    slam.track_monocular(img, ts=i / 30.0)
assert slam.state is TrackingState.OK

cam = slam.cam

# --- time make_frame alone (jitted already via make_frame) ---
f0 = make_frame(frames_dev[0], cam, cfg)
jax.block_until_ready(f0)
t0 = time.perf_counter()
for k in range(16):
    f = make_frame(frames_dev[k % n_frames], cam, cfg)
    jax.block_until_ready(f)
dt = time.perf_counter() - t0
print("make_frame per-frame: %.1f ms" % (1000 * dt / 16))

# --- time full track_batch chunk of 8 ---
slam.activate_localization_mode()
chunk = 8
slam.track_monocular(frames_dev[0], ts=0.0)
out = slam.track_monocular_batch(frames_dev[:chunk], [0.0] * chunk)
t0 = time.perf_counter()
reps = 6
for j in range(reps):
    ch = [frames_dev[(j * chunk + k) % n_frames] for k in range(chunk)]
    out = slam.track_monocular_batch(ch, [0.0] * chunk)
dt = time.perf_counter() - t0
print("track_batch per-frame: %.1f ms (chunk=%d)" % (1000 * dt / (reps * chunk), chunk))

# --- time track_full (single-frame, pre-made frame) ---
st = slam.map
Rl, tl = slam.last_pose
lf = slam.last_frame

tf = jax.jit(tracking.track_full, static_argnames=("cfg",))
o = tracking.track_full(st, f0, Rl, tl, Rl, tl, lf.kp_uv, lf.desc, slam.last_obs, lf.kp_valid, lf.kp_octave, lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg)
jax.block_until_ready(o)
t0 = time.perf_counter()
for k in range(8):
    o = tracking.track_full(st, f0, Rl, tl, Rl, tl, lf.kp_uv, lf.desc, slam.last_obs, lf.kp_valid, lf.kp_octave, lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg)
    jax.block_until_ready(o)
dt = time.perf_counter() - t0
print("track_full(pre-made frame) per-frame: %.1f ms" % (1000 * dt / 8))
