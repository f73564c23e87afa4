#!/usr/bin/env python
"""One-shot TPU per-stage profile -> PROFILE.md.

Times every stage of the per-frame hot path and of the keyframe-insert
mapping phase in a SINGLE process (each new jitted program costs minutes of
remote-compile relay latency here, so all profiling must amortize one
process's compiles). Writes the table VERDICT round-2 item 1 asks for:
where the per-frame and per-insert milliseconds actually go.

Run (long):  python tools/prof_tpu_all.py  [--out PROFILE.md]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_slam")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "PROFILE.md"))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
    from orb_slam2_aruco_tpu.geometry import camera as cam_mod
    from orb_slam2_aruco_tpu.io import synthetic
    from orb_slam2_aruco_tpu.ops import fast, image, orb
    from orb_slam2_aruco_tpu.ops.aruco import detector
    from orb_slam2_aruco_tpu.pipeline import mapping, tracking, loop_closing
    from orb_slam2_aruco_tpu.pipeline.frontend import make_frame, level_quotas
    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

    camc = CameraConfig(fx=500.0, fy=500.0, cx=480.0, cy=270.0,
                        dist=(0, 0, 0, 0, 0), width=960, height=540)
    cfg = SlamConfig().replace(camera=camc)
    cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
    cam = cam_mod.camera_from_config(camc)
    ocfg = cfg.orb
    acfg = cfg.aruco

    dev = jax.devices()[0]
    rows = []

    def bench(name, fn, *a, n=None):
        n = n or args.reps
        jax.block_until_ready(fn(*a))          # compile + settle
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1000
        rows.append((name, dt))
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    # ---- build a real map (also warms the tracking/mapping programs) -----
    world = synthetic.build_world([3, 17, 42, 99, 7, 23, 55, 88],
                                  px_per_m=500.0, spacing=0.6, grid_cols=4)
    n_frames = 16
    frames_np = []
    for i in range(n_frames):
        R, t = synthetic.look_at_plane_pose(
            (0.5 + 0.8 * i / n_frames, 0.3), 2.0,
            yaw=0.1 * np.sin(2 * np.pi * i / n_frames), pitch=0.04)
        frames_np.append(np.clip(
            synthetic.render_view(world, camc, R, t), 0, 255).astype(np.uint8))
    frames_dev = [jax.device_put(f) for f in frames_np]
    jax.block_until_ready(frames_dev)
    img = frames_dev[0]

    print("== building map (warms tracking+mapping programs) ==", flush=True)
    slam = SlamSystem(cfg)
    t0 = time.perf_counter()
    for i, f in enumerate(frames_dev):
        slam.track_monocular(f, ts=i / 30.0)
    slam.flush()
    print(f"build: {time.perf_counter()-t0:.1f}s state={slam.state}",
          flush=True)
    assert slam.state is TrackingState.OK

    # ---- dispatch / RTT floor --------------------------------------------
    @jax.jit
    def null_op(x):
        return x.sum()
    bench("null dispatch+sync (relay RTT floor)", null_op, img)

    # ---- frontend stages -------------------------------------------------
    @jax.jit
    def s_pyr(im):
        g = im.astype(jnp.float32)
        return sum(l.sum() for l in image.build_pyramid(
            g, ocfg.num_levels, ocfg.scale_factor))

    @jax.jit
    def s_fast(im):
        g = im.astype(jnp.float32)
        levels = image.build_pyramid(g, ocfg.num_levels, ocfg.scale_factor)
        quotas = level_quotas(ocfg.num_features, ocfg.num_levels,
                              ocfg.scale_factor)
        acc = jnp.float32(0)
        for lvl, quota in zip(levels, quotas):
            kp = fast.detect_level(
                lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                edge_margin=ocfg.patch_radius + 1)
            acc = acc + kp.xy.sum()
        return acc

    @jax.jit
    def s_orb(im):
        g = im.astype(jnp.float32)
        levels = image.build_pyramid(g, ocfg.num_levels, ocfg.scale_factor)
        quotas = level_quotas(ocfg.num_features, ocfg.num_levels,
                              ocfg.scale_factor)
        acc = jnp.float32(0)
        for lvl, quota in zip(levels, quotas):
            kp = fast.detect_level(
                lvl, ocfg.fast_threshold, ocfg.fast_min_threshold,
                cell_size=ocfg.cell_size, per_cell_k=8, max_kps=quota,
                edge_margin=ocfg.patch_radius + 1)
            blurred = image.gaussian_blur(lvl, ocfg.blur_ksize, ocfg.blur_sigma)
            ang = orb.keypoint_angles(lvl, kp.xy)
            acc = acc + orb.describe(blurred, kp.xy, ang).sum()
        return acc

    @jax.jit
    def s_aruco(im):
        g = im.astype(jnp.float32)
        det = detector.detect_markers(
            g, acfg.dictionary, max_quads=acfg.max_quad_candidates,
            adaptive_win=acfg.adaptive_thresh_win,
            adaptive_c=acfg.adaptive_thresh_c,
            min_area=acfg.min_quad_side_px ** 2, cell_px=acfg.warp_cell_px,
            cc_iters=acfg.cc_iters, downsample=acfg.detect_downsample,
            refine=True, use_pallas_cc=acfg.use_pallas_cc)
        return det.corners.sum() + det.ids.sum()

    @jax.jit
    def s_frame(im):
        fr = make_frame(im, cam, cfg)
        return fr.kp_uv.sum() + fr.desc.sum() + fr.bow.sum()

    bench("frontend: pyramid", s_pyr, img)
    bench("frontend: pyramid+FAST", s_fast, img)
    bench("frontend: pyramid+FAST+blur+BRIEF", s_orb, img)
    bench("frontend: aruco detect (full, refine)", s_aruco, img)
    bench("frontend: make_frame (all of the above + BoW)", s_frame, img)

    # ---- tracking --------------------------------------------------------
    lf = slam.last_frame
    st = slam.map
    Rl, tl = slam.last_pose
    lobs = slam.last_obs
    f0 = make_frame(frames_dev[8], cam, cfg)
    jax.block_until_ready(f0.kp_uv)

    def s_track_full(fr):
        return tracking.track_full(
            st, fr, Rl, tl, Rl, tl, lf.kp_uv, lf.desc, lobs, lf.kp_valid,
            lf.kp_octave, lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg
        ).ctrl
    bench("track_full (cascade, pre-made frame)", s_track_full, f0)

    def s_step(im):
        fr = make_frame(im, cam, cfg)
        return tracking.track_full(
            st, fr, Rl, tl, Rl, tl, lf.kp_uv, lf.desc, lobs, lf.kp_valid,
            lf.kp_octave, lf.kp_angle, jnp.asarray(slam.ref_kf), cam, cfg
        ).ctrl
    s_step = jax.jit(s_step)
    bench("frame step: make_frame + track_full", s_step, img)

    # localization chunk (the serving path)
    stack = jnp.stack([frames_dev[k % n_frames] for k in range(16)])
    vR = jnp.eye(3, dtype=jnp.float32)
    vt = jnp.zeros(3, jnp.float32)

    def s_batch(stk):
        ctrls, _ = tracking.track_batch(
            st, stk, Rl, tl, vR, vt, jnp.asarray(False),
            lf.kp_uv, lf.desc, lobs, lf.kp_valid, lf.kp_octave, lf.kp_angle,
            jnp.asarray(slam.ref_kf), cam, cfg)
        return ctrls
    s_batch = jax.jit(s_batch)
    d = bench("track_batch chunk=16 (localization)", s_batch, stack, n=4)
    rows.append(("track_batch per frame", d / 16))
    print(f"track_batch per frame: {d/16:.2f} ms", flush=True)

    # ---- mapping phase stages -------------------------------------------
    k_dev = jnp.asarray(slam.last_kf_slot)

    def wrap(fn, *a, **kw):
        def run():
            out = fn(*a, **kw)
            return jax.tree_util.tree_leaves(out)[0]
        return run

    bench("mapping: triangulate_vs_covisible (top-20)",
          wrap(mapping.triangulate_vs_covisible, st, k_dev, cam, cfg,
               n_neighbors=cfg.map.triangulation_neighbors, max_new=256))
    bench("mapping: cull_points",
          wrap(mapping.cull_points, st, cfg.map.cull_found_ratio))
    bench("mapping: fuse_duplicates",
          wrap(mapping.fuse_duplicates, st, k_dev, cam, cfg))
    bench("mapping: update_point_stats",
          wrap(mapping.update_point_stats, st, cfg))
    bench("mapping: distinctive_descriptors",
          wrap(mapping.distinctive_descriptors, st, cfg))
    bench("mapping: aruco_plane_update",
          wrap(mapping.aruco_plane_update, st, k_dev, cam, cfg))
    bench("mapping: local BA (8 cams + 8 fixed ring, 2048 pts, 10 it)",
          wrap(mapping.bundle_adjust, st, k_dev, cam, cfg,
               max_cams=cfg.map.local_ba_window, max_pts=2048,
               iters=cfg.optim.local_ba_iters_second,
               max_fixed=cfg.map.local_ba_fixed_ring))
    bench("mapping: cull_keyframes",
          wrap(mapping.cull_keyframes, st, k_dev, cfg))
    bench("loop: detect_loop_by_marker",
          wrap(loop_closing.detect_loop_by_marker, st, k_dev,
               min_gap=cfg.loop.min_kfs_between_loops))
    bench("loop: detect_loop_by_bow",
          wrap(loop_closing.detect_loop_by_bow, st, k_dev,
               min_gap=cfg.loop.min_kfs_between_loops))

    # ---- write PROFILE.md ------------------------------------------------
    plat = jax.devices()[0].platform
    lines = [
        "# PROFILE — per-stage timings (flagship 960x540 / 1000 feats / "
        f"{cfg.map.max_keyframes} KF map)",
        "",
        f"Device: `{dev}` (platform {plat}). Measured by "
        "`tools/prof_tpu_all.py` — each row is mean wall time of a SYNCED "
        "jitted call, so every row includes the dispatch+readback round "
        "trip; subtract the `null dispatch` row for pure device time. "
        "The pipelined SLAM loop (tracking.pipeline_depth) hides that round "
        "trip; the mapping rows are dispatched sync-free at keyframe "
        "inserts (about one insert per 5-10 frames).",
        "",
        "| stage | ms/call |",
        "|---|---|",
    ]
    for name, dt in rows:
        lines.append(f"| {name} | {dt:.2f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
