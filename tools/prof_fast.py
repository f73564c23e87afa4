import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops import fast, image
from orb_slam2_aruco_tpu.pipeline.frontend import level_quotas

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
ocfg = cfg.orb
world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
B = 8
imgs = np.stack([
    np.clip(synthetic.render_view(
        world, camc,
        *synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0, yaw=0.05,
                                      pitch=0.04)), 0, 255).astype(np.uint8)
    for i in range(B)])
stacks = [jax.device_put(np.roll(imgs, k, axis=0)) for k in range(4)]
jax.block_until_ready(stacks)
quotas = level_quotas(ocfg.num_features, ocfg.num_levels, ocfg.scale_factor)


def bench(name, f, n=6):
    fn = jax.jit(lambda st: jax.vmap(f)(st))
    t0 = time.perf_counter(); np.asarray(fn(stacks[0]))
    tc = time.perf_counter() - t0
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(stacks[1 + k % 3]))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1000
    print(f"{name:18s}: {ms/B:6.2f} ms/frame (compile {tc:.0f}s)", flush=True)


def levels_of(img):
    return image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                               ocfg.scale_factor)


def f_scores(img):
    acc = 0.0
    for lvl in levels_of(img):
        s_high, s_low = fast._fast_scores(lvl, [ocfg.fast_threshold,
                                                ocfg.fast_min_threshold])
        acc += s_high.sum() + s_low.sum()
    return acc


def f_scores_nms(img):
    acc = 0.0
    for lvl in levels_of(img):
        s_high, s_low = fast._fast_scores(lvl, [ocfg.fast_threshold,
                                                ocfg.fast_min_threshold])
        acc += fast.nms3x3(s_low).sum() + s_high.sum()
    return acc


def f_celltopk(img):
    acc = 0.0
    for lvl, quota in zip(levels_of(img), quotas):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8,
                               max_kps=quota, edge_margin=16)
        acc += kp.xy.sum()
    return acc


bench("scores only", f_scores)
bench("scores+nms", f_scores_nms)
bench("full detect_level", f_celltopk)
