#!/usr/bin/env python
"""ORB pipeline sub-stage timing on the real TPU: pyramid, blur, FAST,
angles, describe — cumulative programs, chunk-granular, min over reps.

Run: python tools/prof_orb_split.py
"""
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
    from orb_slam2_aruco_tpu.ops import fast, image, orb
    from orb_slam2_aruco_tpu.pipeline.frontend import level_quotas

    cfg, frames_np = bench_scene()
    ocfg = cfg.orb
    B = 16
    imgs = jnp.stack([jnp.asarray(f) for f in frames_np[:B]])
    jax.block_until_ready(imgs)
    quotas = level_quotas(ocfg.num_features, ocfg.num_levels,
                          ocfg.scale_factor)

    def timed(name, fn, reps=15):
        jax.block_until_ready(fn())
        best = 1e9
        for _ in range(reps):
            tic = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - tic)
        print(f"{name:26s}: {1e3 * best:7.1f} ms/chunk = "
              f"{1e3 * best / B:5.2f} ms/frame", flush=True)

    def upto(stage):
        def one(im):
            gray = im.astype(jnp.float32)
            levels = image.build_pyramid(gray, ocfg.num_levels,
                                         ocfg.scale_factor)
            acc = []
            for l, (lvl, quota) in enumerate(zip(levels, quotas)):
                if stage == "pyramid":
                    acc.append(lvl.sum())
                    continue
                blurred = image.gaussian_blur(lvl, ocfg.blur_ksize,
                                              ocfg.blur_sigma)
                if stage == "blur":
                    acc.append(blurred.sum())
                    continue
                kp = fast.detect_level(
                    lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                    cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                    edge_margin=ocfg.patch_radius + 1,
                )
                if stage == "fast":
                    acc.append(kp.xy.sum())
                    continue
                patches = orb.extract_patches(blurred, kp.xy)
                if stage == "patches":
                    acc.append(patches.sum())
                    continue
                ang = orb.angles_from_patches(patches)
                if stage == "angles":
                    acc.append(ang.sum())
                    continue
                acc.append(orb.describe_patches(patches, ang).sum())
            return sum(jnp.atleast_1d(a).sum() for a in acc)

        return jax.jit(lambda: jax.vmap(one)(imgs))

    timed("null", jax.jit(lambda: imgs.sum()))
    for stage in ("pyramid", "blur", "fast", "patches", "angles",
                  "describe"):
        timed(f"upto {stage}", upto(stage))


if __name__ == "__main__":
    main()
