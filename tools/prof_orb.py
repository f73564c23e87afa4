"""ORB sub-stage TPU profile, 8-frame batched dispatches."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops import fast, image, orb
from orb_slam2_aruco_tpu.pipeline.frontend import level_quotas
from orb_slam2_aruco_tpu.worldmap.retrieval import bow_vector

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


def bench(name, fn, n=6):
    t0 = time.perf_counter()
    np.asarray(fn(stacks[0]))
    tc = time.perf_counter() - t0
    ts = []
    for k in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(stacks[1 + k % 3]))
        ts.append(time.perf_counter() - t0)
    ms = np.median(ts) * 1000
    print(f"{name:20s}: {ms/B:7.2f} ms/frame ({ms:6.1f} ms/chunk, "
          f"compile {tc:.0f}s)", flush=True)


def v(fn):
    return jax.jit(lambda st: jax.vmap(fn)(st))


def f_null(img):
    return img.sum()


def f_pyr(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    return sum(l.sum() for l in levels)


def f_fast(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    acc = 0.0
    for lvl, quota in zip(levels, quotas):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8,
                               max_kps=quota, edge_margin=16)
        acc += kp.xy.sum()
    return acc


def f_blur(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    return sum(image.gaussian_blur(l, ocfg.blur_ksize, ocfg.blur_sigma).sum()
               for l in levels)


def f_angles(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    acc = 0.0
    for lvl, quota in zip(levels, quotas):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8,
                               max_kps=quota, edge_margin=16)
        acc += orb.keypoint_angles(lvl, kp.xy).sum()
    return acc


def f_describe(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    acc = jnp.zeros((), jnp.uint32)
    for lvl, quota in zip(levels, quotas):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8,
                               max_kps=quota, edge_margin=16)
        blurred = image.gaussian_blur(lvl, ocfg.blur_ksize, ocfg.blur_sigma)
        ang = orb.keypoint_angles(lvl, kp.xy)
        acc += orb.describe(blurred, kp.xy, ang).sum()
    return acc


def f_bow(img):
    levels = image.build_pyramid(img.astype(jnp.float32), ocfg.num_levels,
                                 ocfg.scale_factor)
    descs, valids = [], []
    for lvl, quota in zip(levels, quotas):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8,
                               max_kps=quota, edge_margin=16)
        blurred = image.gaussian_blur(lvl, ocfg.blur_ksize, ocfg.blur_sigma)
        ang = orb.keypoint_angles(lvl, kp.xy)
        descs.append(orb.describe(blurred, kp.xy, ang))
        valids.append(kp.valid)
    d = jnp.concatenate(descs)
    va = jnp.concatenate(valids)
    return bow_vector(d, va, cfg.retrieval.num_words,
                      cfg.retrieval.proto_seed).sum()


bench("null", v(f_null))
bench("pyramid", v(f_pyr))
bench("pyr+fast", v(f_fast))
bench("pyr+blur", v(f_blur))
bench("pyr+fast+angles", v(f_angles))
bench("pyr+fast+blur+desc", v(f_describe))
bench("full orb + bow", v(f_bow))
