import time
import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector

camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                    dist=(0, 0, 0, 0, 0), width=960, height=540)
world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0,
                              spacing=0.6, grid_cols=4, marker_size=0.165)
imgs = []
for i in range(8):
    R, t = synthetic.look_at_plane_pose((0.5 + 0.05 * i, 0.3), 2.0, yaw=0.05,
                                        pitch=0.04)
    imgs.append(jax.device_put(
        np.clip(synthetic.render_view(world, camc, R, t), 0, 255
                ).astype(np.uint8)))
jax.block_until_ready(imgs)


@jax.jit
def null_op(img):
    return img.sum()


@jax.jit
def det_old(img):
    g = img.astype(jnp.float32)
    d = detector.detect_markers(g, "ARUCO", downsample=2, refine=False,
                                use_pallas_cc=False)
    return d.corners.sum() + d.ids.sum()


@jax.jit
def det_fused(img):
    g = img.astype(jnp.float32)
    d = detector.detect_markers(g, "ARUCO", downsample=2, refine=False,
                                use_pallas_cc=True)
    return d.corners.sum() + d.ids.sum()


def bench(name, fn, n=16):
    t0 = time.perf_counter()
    r = jax.block_until_ready(fn(imgs[0]))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in range(n):
        jax.block_until_ready(fn(imgs[k % 8]))
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:14s}: {dt:7.1f} ms/call (compile {tc:.0f}s, val {float(r):.0f})",
          flush=True)


bench("null", null_op)
bench("detect old", det_old)
bench("detect fused", det_fused)
# correctness on-chip: same ids
d1 = det_old(imgs[0]); d2 = det_fused(imgs[0])
print("old", float(d1), "fused", float(d2))
