"""Per-stage TPU profile with 8-frame vmapped dispatches: amortizes the
relay's per-dispatch overhead (which jitters by +-15 ms) so per-frame
on-chip cost is measurable to ~0.5 ms."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.ops import fast, image, orb
from orb_slam2_aruco_tpu.pipeline.frontend import make_frame, level_quotas
from orb_slam2_aruco_tpu.geometry import camera as cam_mod

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
cam = cam_mod.camera_from_config(camc)
acfg = cfg.aruco
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
stack = stacks[0]


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
    print(f"{name:22s}: {ms/B:7.2f} ms/frame  ({ms:6.1f} ms/chunk, "
          f"compile {tc:.0f}s)", flush=True)


@jax.jit
def s_null(st):
    return st.sum()


@jax.jit
def s_det_old(st):
    def one(img):
        d = detector.detect_markers(
            img.astype(jnp.float32), "ARUCO", downsample=2, refine=False,
            use_pallas_cc=False)
        return d.corners.sum() + d.ids.sum()
    return jax.vmap(one)(st)


@jax.jit
def s_det_fused(st):
    def one(img):
        d = detector.detect_markers(
            img.astype(jnp.float32), "ARUCO", downsample=2, refine=False,
            use_pallas_cc=True)
        return d.corners.sum() + d.ids.sum()
    return jax.vmap(one)(st)


@jax.jit
def s_orb(st):
    def one(img):
        gray = img.astype(jnp.float32)
        levels = image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor)
        quotas = level_quotas(ocfg.num_features, ocfg.num_levels,
                              ocfg.scale_factor)
        acc = 0.0
        for l, (lvl, quota) in enumerate(zip(levels, quotas)):
            kp = fast.detect_level(lvl, ocfg.fast_threshold,
                                   ocfg.fast_min_threshold,
                                   cell_size=ocfg.cell_size, per_cell_k=8,
                                   max_kps=quota,
                                   edge_margin=ocfg.patch_radius + 1)
            blurred = image.gaussian_blur(lvl, ocfg.blur_ksize, ocfg.blur_sigma)
            ang = orb.keypoint_angles(lvl, kp.xy)
            d = orb.describe(blurred, kp.xy, ang)
            acc = acc + d.sum() + kp.xy.sum()
        return acc
    return jax.vmap(one)(st)


@jax.jit
def s_frame_old(st):
    return jax.vmap(lambda im: make_frame(im, cam, cfg).ctrl)(st)


cfg2 = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2,
                                             use_pallas_cc=True))


@jax.jit
def s_frame_fused(st):
    return jax.vmap(lambda im: make_frame(im, cam, cfg2).ctrl)(st)


bench("null", s_null)
bench("orb 8-level", s_orb)
bench("detect old", s_det_old)
bench("detect fused", s_det_fused)
bench("make_frame old", s_frame_old)
bench("make_frame fused", s_frame_fused)
