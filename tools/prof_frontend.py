#!/usr/bin/env python
"""Frontend decomposition on the real TPU: ORB pyramid / ArUco detect /
refine / BoW, timed as separate jitted programs (chunk-granular, min of
reps, null subtracted). Mirrors pipeline/frontend.make_frame piecewise.

Run: python tools/prof_frontend.py
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
    from orb_slam2_aruco_tpu.geometry import camera as cam_mod
    from orb_slam2_aruco_tpu.ops import fast, image, orb
    from orb_slam2_aruco_tpu.ops.aruco import detector
    from orb_slam2_aruco_tpu.pipeline.frontend import make_frame, level_quotas
    from orb_slam2_aruco_tpu.worldmap.retrieval import bow_vector

    cfg, frames_np = bench_scene()
    cam = cam_mod.camera_from_config(cfg.camera)
    acfg = cfg.aruco
    ocfg = cfg.orb
    B = 16
    imgs = jnp.stack([jnp.asarray(f) for f in frames_np[:B]])
    jax.block_until_ready(imgs)

    def timed(name, fn, reps=20):
        out = jax.block_until_ready(fn())
        best = 1e9
        for _ in range(reps):
            tic = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - tic)
        print(f"{name:30s}: {1e3 * best:7.1f} ms/chunk = "
              f"{1e3 * best / B:5.2f} ms/frame", flush=True)
        return out

    timed("null", jax.jit(lambda: imgs.sum()))
    timed("full make_frame", jax.jit(
        lambda: jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)))

    quotas = level_quotas(ocfg.num_features, ocfg.num_levels,
                          ocfg.scale_factor)

    def orb_only(im):
        gray = im.astype(jnp.float32)
        levels = image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor)
        descs = []
        valids = []
        for l, (lvl, quota) in enumerate(zip(levels, quotas)):
            kp = fast.detect_level(
                lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                edge_margin=ocfg.patch_radius + 1,
            )
            blurred = image.gaussian_blur(lvl, ocfg.blur_ksize,
                                          ocfg.blur_sigma)
            ang = orb.keypoint_angles(lvl, kp.xy)
            descs.append(orb.describe(blurred, kp.xy, ang))
            valids.append(kp.valid)
        return jnp.concatenate(descs), jnp.concatenate(valids)

    desc_valid = timed("ORB pyramid+descr only", jax.jit(
        lambda: jax.vmap(orb_only)(imgs)))

    timed("BoW only", jax.jit(lambda: jax.vmap(
        lambda d, v: bow_vector(d, v, cfg.retrieval.num_words,
                                cfg.retrieval.proto_seed)
    )(*desc_valid)))

    def det_only(im):
        gray = image.to_gray(im)
        return detector.detect_markers(
            gray, acfg.dictionary, max_quads=acfg.max_quad_candidates,
            adaptive_win=acfg.adaptive_thresh_win,
            adaptive_c=acfg.adaptive_thresh_c,
            min_area=acfg.min_quad_side_px**2, cell_px=acfg.warp_cell_px,
            cc_iters=acfg.cc_iters, downsample=acfg.detect_downsample,
            refine=False, use_pallas_cc=acfg.use_pallas_cc,
        )

    dets = timed("ArUco detect (no refine)", jax.jit(
        lambda: jax.vmap(det_only)(imgs)))

    def refine_only(im, corners):
        gray = image.to_gray(im)
        return detector.refine_corners_lines(
            gray, corners, n_samples=acfg.refine_samples,
            search_r=acfg.refine_radius, n_search=acfg.refine_search)

    A = acfg.max_markers_per_frame
    top16 = dets.corners[:, :A]
    timed("refine top-16", jax.jit(
        lambda: jax.vmap(refine_only)(imgs, top16)))


if __name__ == "__main__":
    main()
