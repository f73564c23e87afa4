"""Per-stage TPU timing of the keyframe-insert (mapping+loop) phase.

The SLAM-mode fps gap lives here: every keyframe insert chains these
programs onto the device queue (pipeline/system.py:_insert_keyframe), and
the device executes serially — so their summed wall time is dead time for
tracking. Timings on the same built map the insert path sees.

Run from the repo root: python -m tools.profile_mapping
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline import loop_closing, mapping
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))

world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
n_frames = 32
xs = np.concatenate([np.linspace(0.5, 1.3, 16), np.linspace(1.3, 0.5, 16)])
frames = []
for i, x in enumerate(xs):
    R, t = synthetic.look_at_plane_pose(
        (x, 0.3), 2.0, yaw=0.1 * np.sin(2 * np.pi * i / n_frames), pitch=0.04)
    frames.append(np.clip(synthetic.render_view(world, camc, R, t), 0,
                          255).astype(np.uint8))

slam = SlamSystem(cfg)
for i, f in enumerate(frames):
    slam.track_monocular(f, ts=i / 30.0)
slam.flush()
assert slam.state is TrackingState.OK, slam.state
print(f"map: {slam.n_keyframes} KFs, inserts during build: "
      f"{slam.stats['kf_inserted']}")

st = slam.map
cam = slam.cam
k_dev = jnp.asarray(slam.last_kf_slot)


def bench(name, fn, n=12):
    """Enqueue n dispatches back-to-back and sync ONCE: the device runs
    them serially, so (total - one relay RT)/n is the true per-call device
    time — per-call sync would instead measure the relay's (highly
    variable) round-trip latency n times."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:28s}: {dt:7.1f} ms/call   (first {t_compile:.1f}s)",
          flush=True)
    return dt


@jax.jit
def _null(x):
    return x.sum()


_nullarg = jnp.zeros((8,))
bench("null (relay floor)", lambda: _null(_nullarg))

total = 0.0
total += bench("triangulate_vs_covisible", lambda: mapping.triangulate_vs_covisible(
    st, k_dev, cam, cfg, n_neighbors=cfg.map.triangulation_neighbors,
    max_new=256)[0].pt_xyz)
total += bench("cull_points", lambda: mapping.cull_points(
    st, cfg.map.cull_found_ratio)[0].pt_xyz)
total += bench("fuse_duplicates", lambda: mapping.fuse_duplicates(
    st, k_dev, cam, cfg)[0].pt_xyz)
total += bench("update_point_stats", lambda: mapping.update_point_stats(
    st, cfg).pt_xyz)
total += bench("distinctive_descriptors[kf]", lambda: mapping.distinctive_descriptors(
    st, cfg, kf=k_dev).pt_desc)
total += bench("aruco_plane_update", lambda: mapping.aruco_plane_update(
    st, k_dev, cam, cfg)[0].pt_xyz)
total += bench("local BA (window)", lambda: mapping.bundle_adjust(
    st, k_dev, cam, cfg, max_cams=cfg.map.local_ba_window, max_pts=2048,
    iters=cfg.optim.local_ba_iters_second,
    max_fixed=cfg.map.local_ba_fixed_ring)[1])
total += bench("cull_keyframes", lambda: mapping.cull_keyframes(
    st, k_dev, cfg)[1])
total += bench("detect_loops", lambda: loop_closing.detect_loops(
    st, k_dev, min_gap=cfg.loop.min_kfs_between_loops)[0].found)
print(f"{'TOTAL per insert':28s}: {total:7.1f} ms")

# post-loop GBA slice: full-capacity program vs the live-size bucket the
# system now picks at loop-closure time (system.py _gba_shape)
bench("GBA 2 iters K=256 pts=8192", lambda: mapping.bundle_adjust(
    st, k_dev, cam, cfg, max_cams=cfg.map.max_keyframes, max_pts=8192,
    iters=2, window_all=True)[1], n=6)
bench("GBA 2 iters K=32 pts=2048", lambda: mapping.bundle_adjust(
    st, k_dev, cam, cfg, max_cams=32, max_pts=2048,
    iters=2, window_all=True)[1], n=6)
