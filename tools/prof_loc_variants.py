#!/usr/bin/env python
"""Time localization-path variants on the real TPU against the bench map.

Loads the checkpoint + frames produced by tools/build_bench_map.py and runs
`localize_stream` under several config variants (local-map candidate cap,
stage-1 seed LM budget) — each variant is its own compiled program, all in
one process so the remote-compile relay cost amortizes.

Run: python tools/prof_loc_variants.py [--map /tmp/bench_map] [--reps 4]
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
    ap.add_argument("--map", default="/tmp/bench_map")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--n", type=int, default=96)
    args = ap.parse_args()

    from tools.build_bench_map import bench_scene
    from orb_slam2_aruco_tpu.io.ingest import StagedSource
    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem

    cfg0, _ = bench_scene()
    frames = np.load(args.map + "_frames.npz")["frames"]
    nf = frames.shape[0]

    variants = [
        ("scan/16", {}, 16),
        ("extrap p2/16", dict(loc_seed_mode="extrapolate"), 16),
        ("extrap p1/16",
         dict(loc_seed_mode="extrapolate", loc_extrap_passes=1), 16),
        ("extrap p1/32",
         dict(loc_seed_mode="extrapolate", loc_extrap_passes=1), 32),
    ]

    import dataclasses
    for name, tweaks, chunk in variants:
        args.chunk = chunk
        cfg = cfg0.replace(
            tracking=dataclasses.replace(cfg0.tracking, **tweaks),
        )
        slam = SlamSystem(cfg)
        slam.load_map(args.map + ".npz")
        slam.activate_localization_mode()
        # prime: establish last_frame/pose via one per-frame track
        p = slam.track_monocular(frames[0], ts=0.0)
        if p is None:
            print(f"{name}: prime failed (reloc path)"); continue
        # warm-up (compile)
        list(slam.localize_stream(
            StagedSource([(frames[k % nf], 0.0)
                          for k in range(args.chunk)]), chunk=args.chunk))
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = list(slam.localize_stream(
                StagedSource([(frames[k % nf], 0.0)
                              for k in range(args.n)]), chunk=args.chunk))
            dt = time.perf_counter() - t0
            assert len(out) == args.n
            ok = sum(1 for _, _, pp in out if pp is not None)
            best = min(best, dt)
        print(f"{name:28s}: {1e3 * best / args.n:6.2f} ms/frame "
              f"({args.n / best:6.1f} fps, {ok}/{args.n} ok)")


if __name__ == "__main__":
    main()
