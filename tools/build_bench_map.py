#!/usr/bin/env python
"""Build the bench scene's map on CPU and checkpoint it + the rendered
frames, so TPU-side localization profiling (tools/prof_loc_variants.py)
only has to compile the localization programs, not the whole SLAM path.

Run: python tools/build_bench_map.py  [--out /tmp/bench_map]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_scene():
    from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
    from orb_slam2_aruco_tpu.io import synthetic

    camc = CameraConfig(
        fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0),
        width=960, height=540,
    )
    cfg = SlamConfig().replace(camera=camc)
    cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))
    world = synthetic.build_world(
        [3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0, spacing=0.6,
        grid_cols=4, marker_size=0.165,
    )
    n_base = 16
    n_frames = 2 * n_base
    xs = np.concatenate([
        np.linspace(0.5, 1.3, n_base),
        np.linspace(1.3, 0.5, n_frames - n_base),
    ])
    poses = [
        synthetic.look_at_plane_pose(
            (x, 0.3), 2.0, yaw=0.1 * np.sin(2 * np.pi * i / n_frames),
            pitch=0.04,
        )
        for i, x in enumerate(xs)
    ]
    frames = [
        np.clip(synthetic.render_view(world, camc, R, t), 0, 255).astype(
            np.uint8
        )
        for R, t in poses
    ]
    return cfg, frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_map")
    args = ap.parse_args()

    # CPU-only here (the map BUILD is compile-heavy; TPU profiling loads the
    # checkpoint instead). Must NOT run at import: tools/prof_loc_variants
    # imports bench_scene() and needs the real TPU backend.
    import jax
    jax.config.update("jax_platforms", "cpu")

    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

    cfg, frames = bench_scene()
    slam = SlamSystem(cfg)
    for i, f in enumerate(frames):
        slam.track_monocular(f, ts=i / 30.0)
    slam.flush()
    assert slam.state is TrackingState.OK, slam.state
    slam.save_map(args.out + ".npz")
    np.savez_compressed(args.out + "_frames.npz",
                        frames=np.stack(frames))
    print(f"{args.out}.npz: {slam.n_keyframes} KFs, "
          f"{int(slam.map.num_points())} points, "
          f"{int(slam.map.num_markers())} markers")


if __name__ == "__main__":
    main()
