import time, math
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0), width=960, height=540)
cfg = SlamConfig().replace(camera=camc)
acfg = cfg.aruco.__class__(detect_downsample=2)
cfg = cfg.replace(aruco=acfg)

world = synthetic.build_world([3, 17, 42, 99], px_per_m=500.0, spacing=0.6, grid_cols=4, marker_size=0.165)
imgs = []
for i in range(8):
    R, t = synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0, yaw=0.05, pitch=0.04)
    imgs.append(jax.device_put(np.clip(synthetic.render_view(world, camc, R, t), 0, 255).astype(np.uint8)))
jax.block_until_ready(imgs)

ds = 2


def prep(img):
    gray = img.astype(jnp.float32)
    binary = detector.adaptive_threshold(gray, acfg.adaptive_thresh_win, acfg.adaptive_thresh_c)
    h0, w0 = binary.shape
    blocks = binary[:(h0 // ds) * ds, :(w0 // ds) * ds].reshape(h0 // ds, ds, w0 // ds, ds)
    return gray, blocks.sum(axis=(1, 3)) * 2 >= ds * ds


@jax.jit
def s1_cc(img):
    gray, binary_s = prep(img)
    lab = detector.connected_components(binary_s, iters=binary_s.shape[0] + binary_s.shape[1], rounds=4)
    return lab.sum()


@jax.jit
def s2_areas(img):
    gray, binary_s = prep(img)
    lab2d = detector.connected_components(binary_s, iters=0, rounds=4)
    P = lab2d.size
    astride = max(1, int(round(math.sqrt(P / 32768.0)))) if P > 40000 else 1
    sub = lab2d[::astride, ::astride].reshape(-1)
    ss = jnp.sort(sub)
    left = jnp.searchsorted(ss, ss, side="left")
    right = jnp.searchsorted(ss, ss, side="right")
    area = (right - left).astype(jnp.float32)
    vals, pos = jax.lax.top_k(jnp.where((left == jnp.arange(ss.shape[0])) & (ss < P), area, 0.0), acfg.max_quad_candidates)
    return vals.sum() + ss[pos].sum()


@jax.jit
def s3_quads(img):
    gray, binary_s = prep(img)
    q, v, ok = detector.quad_candidates(binary_s, acfg.max_quad_candidates,
                                        min_area=acfg.min_quad_side_px**2 / 4, cc_iters=0)
    return q.sum() + v.sum()


@jax.jit
def s4_full(img):
    gray, binary_s = prep(img)
    det = detector.detect_markers(gray, acfg.dictionary, max_quads=acfg.max_quad_candidates,
                                  adaptive_win=acfg.adaptive_thresh_win, adaptive_c=acfg.adaptive_thresh_c,
                                  min_area=acfg.min_quad_side_px**2, cell_px=acfg.warp_cell_px,
                                  cc_iters=acfg.cc_iters, downsample=2, refine=False)
    return det.corners.sum() + det.ids.sum()


def bench(name, fn, n=8):
    v = float(fn(imgs[0]))
    t0 = time.perf_counter()
    for k in range(n):
        v = float(fn(imgs[k % 8]))
    print(f"{name}: {(time.perf_counter() - t0) / n * 1000:.1f} ms", flush=True)


bench("cc only (4 rounds)", s1_cc)
bench("cc + area sort/topk", s2_areas)
bench("cc + areas + quad corners", s3_quads)
bench("full detect", s4_full)
print("quad candidates Q =", acfg.max_quad_candidates)
