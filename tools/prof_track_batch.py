#!/usr/bin/env python
"""Device-time comparison of track_batch variants (chunk-granular, null
dispatch subtracted, min over many reps) — immune to the relay round-trip
weather that makes end-to-end stream fps comparisons noisy.

Run: python tools/prof_track_batch.py
"""
import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_slam")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tools.build_bench_map import bench_scene
    from orb_slam2_aruco_tpu.io import checkpoint
    from orb_slam2_aruco_tpu.geometry import camera as cam_mod
    from orb_slam2_aruco_tpu.pipeline import tracking
    from orb_slam2_aruco_tpu.pipeline.frontend import make_frame

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    args, _ = ap.parse_known_args()
    cfg0, frames_np = bench_scene()
    cam = cam_mod.camera_from_config(cfg0.camera)
    state = checkpoint.load_map("/tmp/bench_map.npz")
    B = args.b
    imgs = jnp.stack([jnp.asarray(frames_np[i % len(frames_np)])
                      for i in range(B)])
    jax.block_until_ready(imgs)

    R0 = state.kf_Rcw[0]
    t0 = state.kf_tcw[0]
    I3 = jnp.eye(3, dtype=jnp.float32)
    z3 = jnp.zeros((3,), jnp.float32)
    ref_kf = jnp.asarray(0)

    def timed(name, fn, reps=20):
        jax.block_until_ready(fn())
        best = 1e9
        for _ in range(reps):
            tic = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - tic)
        print(f"{name:30s}: {1e3 * best:7.1f} ms/chunk = "
              f"{1e3 * best / B:5.2f} ms/frame", flush=True)
        return best

    null = timed("null", jax.jit(lambda: imgs.sum()))

    fr = timed("frontend vmap",
               jax.jit(lambda: jax.vmap(
                   lambda im: make_frame(im, cam, cfg0))(imgs)))

    def tb(cfg):
        # dummy last-frame context from frame 0's frontend output
        f0 = jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)
        lastf = jax.tree_util.tree_map(lambda a: a[0], f0)
        no_obs = jnp.full_like(lastf.kp_octave, -1)

        @jax.jit
        def run():
            return tracking.track_batch(
                state, imgs, R0, t0, I3, z3, jnp.asarray(False),
                lastf.kp_uv, lastf.desc, no_obs, lastf.kp_valid,
                lastf.kp_octave, lastf.kp_angle, ref_kf, cam, cfg,
            )

        return run

    for name, tweaks in [
        ("scan", {}),
        ("extrap p2", dict(loc_seed_mode="extrapolate")),
        ("extrap p1", dict(loc_seed_mode="extrapolate",
                           loc_extrap_passes=1)),
    ]:
        cfg = cfg0.replace(
            tracking=dataclasses.replace(cfg0.tracking, **tweaks))
        t = timed(f"track_batch {name}", tb(cfg))
        print(f"{'':30s}  -> minus null: "
              f"{1e3 * (t - null) / B:5.2f} ms/frame device", flush=True)


if __name__ == "__main__":
    main()
