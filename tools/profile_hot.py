"""Fine-grained timing of the keyframe-insert hot spots found by
profile_mapping (local BA ~1.5 s, detect_loops ~1.4 s, triangulate ~160 ms):
times each sub-program with queued dispatches (one sync per batch) so relay
round trips don't pollute the numbers.

Run from the repo root: python -m tools.profile_hot
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.pipeline import mapping
from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState
from orb_slam2_aruco_tpu.worldmap import covisibility, retrieval
from orb_slam2_aruco_tpu.optim import ba as ba_mod

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))

world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
xs = np.concatenate([np.linspace(0.5, 1.3, 16), np.linspace(1.3, 0.5, 16)])
frames = []
for i, x in enumerate(xs):
    R, t = synthetic.look_at_plane_pose(
        (x, 0.3), 2.0, yaw=0.1 * np.sin(2 * np.pi * i / 32), pitch=0.04)
    frames.append(np.clip(synthetic.render_view(world, camc, R, t), 0,
                          255).astype(np.uint8))

slam = SlamSystem(cfg)
for i, f in enumerate(frames):
    slam.track_monocular(f, ts=i / 30.0)
slam.flush()
assert slam.state is TrackingState.OK, slam.state
st = slam.map
cam = slam.cam
k_dev = jnp.asarray(slam.last_kf_slot)
print(f"map: {slam.n_keyframes} KFs")


def bench(name, fn, n=10):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:36s}: {dt:8.1f} ms   (first {t_first:.1f}s)", flush=True)
    return dt


# ---- loop-detection sub-programs ------------------------------------------
cov_j = jax.jit(lambda s: covisibility.covisibility_matrix(s))
inc_j = jax.jit(lambda s: covisibility.incidence_matrix(s))
bench("incidence_matrix [K,L]", lambda: inc_j(st))
bench("covisibility_matrix [K,K]", lambda: cov_j(st))

from orb_slam2_aruco_tpu.pipeline.loop_closing import (
    detect_loop_by_bow, detect_loop_by_marker)
bench("detect_loop_by_marker", lambda: detect_loop_by_marker(
    st, k_dev, min_gap=cfg.loop.min_kfs_between_loops).found)
bench("detect_loop_by_bow", lambda: detect_loop_by_bow(
    st, k_dev, min_gap=cfg.loop.min_kfs_between_loops).found)

# ---- local BA decomposition -----------------------------------------------
prob_j = jax.jit(
    lambda s, k: mapping.build_ba_problem(
        s, k, cfg, max_cams=cfg.map.local_ba_window, max_pts=2048,
        window_all=False, max_fixed=cfg.map.local_ba_fixed_ring),
    static_argnames=(),
)
bench("build_ba_problem (local)", lambda: prob_j(st, k_dev)[0].points)
prob = prob_j(st, k_dev)[0]
jax.block_until_ready(prob)
E = prob.e_kf.shape[0]
print(f"  local problem: K={prob.Rcw.shape[0]} L={prob.points.shape[0]} "
      f"E={E} M={prob.Rwm.shape[0]}")

solve_j = jax.jit(
    lambda p: ba_mod.ba_solve(p, cam, iters=10,
                              huber_delta=cfg.optim.huber_delta,
                              lam0=cfg.optim.lm_lambda_init).chi2)
solve1_j = jax.jit(
    lambda p: ba_mod.ba_solve(p, cam, iters=1,
                              huber_delta=cfg.optim.huber_delta,
                              lam0=cfg.optim.lm_lambda_init).chi2)
bench("ba_solve local iters=1", lambda: solve1_j(prob))
bench("ba_solve local iters=10", lambda: solve_j(prob))

# ---- triangulation --------------------------------------------------------
for nb in (8, 20):
    bench(f"triangulate n_neighbors={nb}", lambda nb=nb:
          mapping.triangulate_vs_covisible(
              st, k_dev, cam, cfg, n_neighbors=nb, max_new=256)[0].pt_xyz)
