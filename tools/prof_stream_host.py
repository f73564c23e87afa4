#!/usr/bin/env python
"""Host-side timing of the localize_stream chunk loop on the real TPU:
replicates the dispatch/emit structure with per-section timers to see where
the wall-clock goes beyond device compute (stack, dispatch, readback wait,
staging).

Run: python tools/prof_stream_host.py
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
    from orb_slam2_aruco_tpu.pipeline import tracking
    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem

    cfg, frames_np = bench_scene()
    B = 32
    slam = SlamSystem(cfg)
    slam.load_map("/tmp/bench_map.npz")
    slam.activate_localization_mode()
    p = slam.track_monocular(frames_np[0], ts=0.0)
    assert p is not None

    nf = len(frames_np)
    stacks_host = [
        np.stack([frames_np[(c * B + i) % nf] for i in range(B)])
        for c in range(4)
    ]

    def dispatch(stack_dev):
        if slam.vel is not None:
            vR, vt, hv = slam.vel[0], slam.vel[1], jnp.asarray(True)
        else:
            vR = jnp.eye(3, dtype=jnp.float32)
            vt = jnp.zeros(3, dtype=jnp.float32)
            hv = jnp.asarray(False)
        ctrls, carry = tracking.track_batch(
            slam.map, stack_dev, slam.last_pose[0], slam.last_pose[1],
            vR, vt, hv,
            slam.last_frame.kp_uv, slam.last_frame.desc, slam.last_obs,
            slam.last_frame.kp_valid, slam.last_frame.kp_octave,
            slam.last_frame.kp_angle,
            jnp.asarray(slam.ref_kf), slam.cam, slam.cfg,
        )
        (Rl, tl, vR2, vt2, _, luv, ldesc, lobs, lval, loct, lang,
         vis, found) = carry
        slam.map = slam.map._replace(pt_visible=vis, pt_found=found)
        slam.last_frame = slam.last_frame._replace(
            kp_uv=luv, desc=ldesc, kp_valid=lval, kp_octave=loct,
            kp_angle=lang)
        slam.last_obs = lobs
        slam.last_pose = (Rl, tl)
        slam.vel = (vR2, vt2)
        return ctrls

    # warm-up compile
    sd = jax.device_put(stacks_host[0])
    c = dispatch(sd)
    np.asarray(c)

    n_chunks = 12
    t_put = t_disp = t_read = 0.0
    pending = None
    t_all0 = time.perf_counter()
    for k in range(n_chunks):
        t0 = time.perf_counter()
        sd = jax.device_put(stacks_host[k % 4])
        t1 = time.perf_counter()
        ctrls = dispatch(sd)
        t2 = time.perf_counter()
        if pending is not None:
            np.asarray(pending)
        t3 = time.perf_counter()
        pending = ctrls
        t_put += t1 - t0
        t_disp += t2 - t1
        t_read += t3 - t2
    np.asarray(pending)
    total = time.perf_counter() - t_all0
    n = n_chunks * B
    print(f"device_put : {1e3 * t_put / n_chunks:7.1f} ms/chunk")
    print(f"dispatch   : {1e3 * t_disp / n_chunks:7.1f} ms/chunk")
    print(f"read prev  : {1e3 * t_read / n_chunks:7.1f} ms/chunk")
    print(f"TOTAL      : {1e3 * total / n_chunks:7.1f} ms/chunk = "
          f"{1e3 * total / n:5.2f} ms/frame ({n / total:5.1f} fps)")


if __name__ == "__main__":
    main()


def chained():
    """Steady-state device time with REAL chained carries (the stream's
    actual workload): dispatch k+1 only after k's carry is materialized, so
    each timing covers exactly one chunk's compute."""
    import jax
    import jax.numpy as jnp
    from tools.build_bench_map import bench_scene
    from orb_slam2_aruco_tpu.pipeline import tracking
    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem

    cfg, frames_np = bench_scene()
    B = 32
    slam = SlamSystem(cfg)
    slam.load_map("/tmp/bench_map.npz")
    slam.activate_localization_mode()
    assert slam.track_monocular(frames_np[0], ts=0.0) is not None
    nf = len(frames_np)
    stack = jax.device_put(
        np.stack([frames_np[i % nf] for i in range(B)]))
    jax.block_until_ready(stack)

    def step():
        if slam.vel is not None:
            vR, vt, hv = slam.vel[0], slam.vel[1], jnp.asarray(True)
        else:
            vR = jnp.eye(3, dtype=jnp.float32)
            vt = jnp.zeros(3, dtype=jnp.float32)
            hv = jnp.asarray(False)
        ctrls, carry = tracking.track_batch(
            slam.map, stack, slam.last_pose[0], slam.last_pose[1],
            vR, vt, hv,
            slam.last_frame.kp_uv, slam.last_frame.desc, slam.last_obs,
            slam.last_frame.kp_valid, slam.last_frame.kp_octave,
            slam.last_frame.kp_angle,
            jnp.asarray(slam.ref_kf), slam.cam, slam.cfg,
        )
        (Rl, tl, vR2, vt2, _, luv, ldesc, lobs, lval, loct, lang,
         vis, found) = carry
        slam.map = slam.map._replace(pt_visible=vis, pt_found=found)
        slam.last_frame = slam.last_frame._replace(
            kp_uv=luv, desc=ldesc, kp_valid=lval, kp_octave=loct,
            kp_angle=lang)
        slam.last_obs = lobs
        slam.last_pose = (Rl, tl)
        slam.vel = (vR2, vt2)
        return ctrls

    c = step(); np.asarray(c)        # compile + settle
    import time as _t
    for k in range(8):
        t0 = _t.perf_counter()
        c = step()
        jax.block_until_ready(c)
        n_ok = int((np.asarray(c)[:, 0] >= 30).sum())
        print(f"chained chunk {k}: {1e3*(_t.perf_counter()-t0):7.1f} ms "
              f"({1e3*(_t.perf_counter()-t0)/B:5.2f} ms/frame, ok={n_ok}/32)",
              flush=True)


if __name__ == "__main__" and os.environ.get("CHAINED"):
    chained()
