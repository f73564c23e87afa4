#!/usr/bin/env python
"""Stage-level split of the localization cascade on the real TPU.

Times, at bench shapes against the bench-map checkpoint
(tools/build_bench_map.py): the vmapped frontend, the stage-1 seed scan,
the stage-2 refine vmap, and stage-2's internal pieces (local-map mask,
candidate compaction + window match, 4x10 LM refine). All chunk-granular
(one sync per measured call) with a null-dispatch baseline subtracted.

Run: python tools/prof_cascade_split.py
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
    from orb_slam2_aruco_tpu.io import checkpoint
    from orb_slam2_aruco_tpu.geometry import camera as cam_mod
    from orb_slam2_aruco_tpu.pipeline import tracking
    from orb_slam2_aruco_tpu.pipeline.frontend import make_frame

    cfg, frames_np = bench_scene()
    cam = cam_mod.camera_from_config(cfg.camera)
    state = checkpoint.load_map("/tmp/bench_map.npz")
    B = 16
    imgs = jnp.stack([jnp.asarray(f) for f in frames_np[:B]])
    jax.block_until_ready(imgs)

    R0 = state.kf_Rcw[0]
    t0 = state.kf_tcw[0]
    ref_kf = jnp.asarray(0)

    def timed(name, fn, reps=8):
        out = fn()                       # compile
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(reps):
            tic = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - tic)
        print(f"{name:34s}: {1e3 * best:7.1f} ms/chunk = "
              f"{1e3 * best / B:5.2f} ms/frame", flush=True)
        return out

    timed("null", jax.jit(lambda: imgs.sum()))

    frames = timed(
        "frontend vmap",
        jax.jit(lambda: jax.vmap(lambda im: make_frame(im, cam, cfg))(imgs)),
    )

    # ---- stage 1: sequential seed scan ----------------------------------
    lastf = jax.tree_util.tree_map(lambda a: a[0], frames)
    last_obs = jnp.full_like(lastf.kp_octave, -1)

    @jax.jit
    def stage1():
        def seed_step(carry, frame):
            Rl, tl = carry
            tr, slots, old, ok_a, need_ref = tracking._cascade_seed(
                state, frame, Rl, tl, Rl, tl,
                lastf.kp_uv, lastf.desc, last_obs, lastf.kp_valid,
                lastf.kp_octave, lastf.kp_angle, ref_kf, cam, cfg,
                seed_budget=True,
            )
            return (tr.Rcw, tr.tcw), (tr, slots, old, ok_a, need_ref)

        return jax.lax.scan(seed_step, (R0, t0), frames)[1]

    trs, slots_b, old_b, oka_b, needref_b = timed("stage-1 seed scan", stage1)

    # ---- stage 2: vmapped local-map refine ------------------------------
    @jax.jit
    def stage2():
        return jax.vmap(
            lambda frame, tr, slots, old, ok_a, need_ref:
            tracking._cascade_refine(state, frame, tr, slots, old, ok_a,
                                     need_ref, ref_kf, cam, cfg)
        )(frames, trs, slots_b, old_b, oka_b, needref_b)

    timed("stage-2 refine vmap", stage2)

    # ---- stage-2 internals ----------------------------------------------
    @jax.jit
    def s2_mask():
        return jax.vmap(
            lambda tr: tracking.local_point_mask(
                state, tr.obs_point, cfg.tracking.max_local_keyframes)
        )(trs)

    masks, _ = timed("  local_point_mask vmap", s2_mask)

    @jax.jit
    def s2_tlm():
        return jax.vmap(
            lambda frame, tr, slots, old, m: tracking.track_local_map(
                state, frame, slots, tr.Rcw, tr.tcw, tr.obs_point, cam, cfg,
                old=old, pt_candidates=m)
        )(frames, trs, slots_b, old_b, masks)

    timed("  track_local_map vmap", s2_tlm)

    @jax.jit
    def s2_opt():
        return jax.vmap(
            lambda frame, tr, slots, old: tracking._optimize(
                state, frame, slots, tr.Rcw, tr.tcw, tr.obs_point, cam, cfg,
                old=old)
        )(frames, trs, slots_b, old_b)

    timed("    _optimize 4x10 LM vmap", s2_opt)


if __name__ == "__main__":
    main()
