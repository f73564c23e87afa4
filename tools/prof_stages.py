import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.ops import fast, image, orb
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.pipeline.frontend import level_quotas
from orb_slam2_aruco_tpu.worldmap.retrieval import bow_vector

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
cam = cam_mod.camera_from_config(camc)

world = synthetic.build_world([3, 17, 42, 99], px_per_m=500.0, spacing=0.6, grid_cols=4, marker_size=0.165)
imgs = []
for i in range(8):
    R, t = synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0, yaw=0.05, pitch=0.04)
    imgs.append(jax.device_put(np.clip(synthetic.render_view(world, camc, R, t), 0, 255).astype(np.uint8)))
jax.block_until_ready(imgs)
img = imgs[0]

ocfg = cfg.orb
acfg = cfg.aruco


@jax.jit
def stage_pyramid(img):
    gray = img.astype(jnp.float32)
    return sum(l.sum() for l in image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor))


@jax.jit
def stage_fast(img):
    gray = img.astype(jnp.float32)
    levels = image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor)
    quotas = level_quotas(ocfg.num_features, ocfg.num_levels, ocfg.scale_factor)
    out = []
    for l, (lvl, quota) in enumerate(zip(levels, quotas)):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                               edge_margin=ocfg.patch_radius + 1)
        out.append(kp.xy)
    return sum(o.sum() for o in out)


@jax.jit
def stage_orb_full(img):
    gray = img.astype(jnp.float32)
    levels = image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor)
    quotas = level_quotas(ocfg.num_features, ocfg.num_levels, ocfg.scale_factor)
    descs = []
    for l, (lvl, quota) in enumerate(zip(levels, quotas)):
        kp = fast.detect_level(lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                               cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                               edge_margin=ocfg.patch_radius + 1)
        blurred = image.gaussian_blur(lvl, ocfg.blur_ksize, ocfg.blur_sigma)
        ang = orb.keypoint_angles(lvl, kp.xy)
        d = orb.describe(blurred, kp.xy, ang)
        descs.append(d)
    return sum(o.sum() for o in descs)


@jax.jit
def stage_aruco(img):
    gray = img.astype(jnp.float32)
    det = detector.detect_markers(
        gray, acfg.dictionary, max_quads=acfg.max_quad_candidates,
        adaptive_win=acfg.adaptive_thresh_win, adaptive_c=acfg.adaptive_thresh_c,
        min_area=acfg.min_quad_side_px**2, cell_px=acfg.warp_cell_px,
        cc_iters=acfg.cc_iters, downsample=acfg.detect_downsample,
        refine=False, use_pallas_cc=acfg.use_pallas_cc)
    return det.corners.sum() + det.ids.sum()


@jax.jit
def stage_aruco_cc(img):
    gray = img.astype(jnp.float32)
    binary = detector.adaptive_threshold(gray, acfg.adaptive_thresh_win, acfg.adaptive_thresh_c)
    ds = 2
    h0, w0 = binary.shape
    blocks = binary[:(h0 // ds) * ds, :(w0 // ds) * ds].reshape(h0 // ds, ds, w0 // ds, ds)
    binary_s = blocks.sum(axis=(1, 3)) * 2 >= ds * ds
    q, v, ok = detector.quad_candidates(binary_s, acfg.max_quad_candidates,
                                    min_area=acfg.min_quad_side_px**2 / 4,
                                    cc_iters=acfg.cc_iters)
    return q.sum() + v.sum()


@jax.jit
def stage_thresh(img):
    gray = img.astype(jnp.float32)
    return detector.adaptive_threshold(gray, acfg.adaptive_thresh_win, acfg.adaptive_thresh_c).sum()


def bench(name, fn, *a, n=8):
    v = float(fn(imgs[0], *a[1:]))
    t0 = time.perf_counter()
    for k in range(n):
        v = float(fn(imgs[k % 8], *a[1:]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name}: {dt:.1f} ms  (incl ~22ms round trip)", flush=True)


# null dispatch to estimate per-call overhead
@jax.jit
def null_op(img):
    return img.sum()

bench("null dispatch+sync", null_op, img)
bench("pyramid", stage_pyramid, img)
bench("pyramid+FAST", stage_fast, img)
bench("pyramid+FAST+blur+angles+BRIEF", stage_orb_full, img)
bench("aruco adaptive_threshold", stage_thresh, img)
bench("aruco thresh+CC+quads", stage_aruco_cc, img)
bench("aruco full detect (no refine)", stage_aruco, img)
