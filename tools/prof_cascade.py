"""Cascade sub-stage TPU profile: each component wrapped in an 8-step
lax.scan (the sequential execution shape it has inside track_batch)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState
from orb_slam2_aruco_tpu.pipeline import tracking
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame, scale_sigma2
from orb_slam2_aruco_tpu.optim import pose_opt
from orb_slam2_aruco_tpu.geometry import camera as cam_mod

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
cam = cam_mod.camera_from_config(camc)
world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
n_frames = 16
imgs = []
for i in range(n_frames):
    x = 0.5 + 0.8 * i / n_frames
    R, t = synthetic.look_at_plane_pose((x, 0.3), 2.0,
                                        yaw=0.1*np.sin(2*np.pi*i/n_frames),
                                        pitch=0.04)
    imgs.append(jax.device_put(np.clip(
        synthetic.render_view(world, camc, R, t), 0, 255).astype(np.uint8)))
jax.block_until_ready(imgs)
slam = SlamSystem(cfg)
for i, img in enumerate(imgs):
    slam.track_monocular(img, ts=i / 30.0)
assert slam.state is TrackingState.OK
st = slam.map
Rl, tl = slam.last_pose
lf = slam.last_frame
lobs = slam.last_obs
frame = make_frame(imgs[0], cam, cfg)
slots = tracking.bind_markers(st, frame)
jax.block_until_ready((frame, slots))
L = st.L
print("L =", L, "K =", st.K, flush=True)


def scan8(body):
    @jax.jit
    def run(seed):
        def step(c, _):
            return body(c), ()
        out, _ = jax.lax.scan(step, seed, None, length=8)
        return out
    return run


def bench(name, fn, seed, n=6):
    t0 = time.perf_counter(); np.asarray(jax.tree.leaves(fn(seed))[0])
    tc = time.perf_counter() - t0
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(seed + (1 + k) * 1e-6))[0])
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1000
    print(f"{name:22s}: {ms/8:7.2f} ms/step ({ms:6.1f} ms/8, compile {tc:.0f}s)",
          flush=True)


# null scan
bench("scan null", scan8(lambda c: c + 1.0), jnp.float32(0))

# top_k(L, 4096)
cand = (st.pt_valid & (jnp.arange(L) % 3 == 0))
def b_topk(c):
    sc, ci = jax.lax.top_k((cand & (c > -1)).astype(jnp.int32), min(L, 4096))
    return c + sc[0].astype(jnp.float32)
bench("top_k(L,4096)", scan8(b_topk), jnp.float32(0))

# local_point_mask
def b_lpm(c):
    m, best = tracking.local_point_mask(st, lobs + (c > 1e9), 80)
    return c + m[0].astype(jnp.float32) + best.astype(jnp.float32)
bench("local_point_mask", scan8(b_lpm), jnp.float32(0))

# pose_opt (4x10)
pts, pvalid = tracking._point_world_arrays(st, lobs)
inv_s2 = scale_sigma2(cfg.orb.num_levels, cfg.orb.scale_factor)[lf.kp_octave]
def b_pose(c):
    res = pose_opt.optimize_pose(
        Rl, tl + c * 0, cam, pts, lf.kp_uv, pvalid & lf.kp_valid, inv_s2,
        rounds=4, iters_per_round=10)
    return c + res.tcw[0]
bench("pose_opt 4x10", scan8(b_pose), jnp.float32(0))

# track_frame (match + pose_opt)
def b_tf(c):
    r = tracking.track_frame(st, frame, slots, Rl, tl + c * 0,
                             lf.kp_uv, lf.desc, lobs, lf.kp_valid,
                             lf.kp_octave, lf.kp_angle, cam, cfg,
                             search_radius=cfg.matcher.search_radius_motion)
    return c + r.tcw[0]
bench("track_frame", scan8(b_tf), jnp.float32(0))

# track_local_map
def b_tlm(c):
    (r, (vis, fnd)) = tracking.track_local_map(
        st, frame, slots, Rl, tl + c * 0, lobs, cam, cfg)
    return c + r.tcw[0]
bench("track_local_map", scan8(b_tlm), jnp.float32(0))

# full track_full
def b_full(c):
    out = tracking.track_full(st, frame, Rl, tl + c * 0, Rl, tl,
                              lf.kp_uv, lf.desc, lobs, lf.kp_valid,
                              lf.kp_octave, lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg)
    return c + out.ctrl[0]
bench("track_full cascade", scan8(b_full), jnp.float32(0))
