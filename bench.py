"""Benchmark: monocular tracking throughput on one chip.

Prints ONE JSON line with the headline metric plus the BASELINE.md
companions:
  value            localization-mode tracking fps (the reference's own
                   two-pass serving workload, mono_cvcam.cc:183-235),
                   pipelined chunked dispatch (SlamSystem.localize_stream)
  slam_fps         SLAM-mode fps (per-frame tracking + keyframe insertion +
                   triangulation + local BA — the reference's pass 1)
  p50_ms / p90_ms  per-frame latency percentiles of the SLAM pass
  ba_iters_per_s   global-BA LM iterations per second on the built map
  vs_baseline      fps / 30 (the reference's ~30 Hz real-time design budget:
                   20 ms sleep per frame in its drive loops,
                   mono_cvcam.cc:143; no published numbers exist —
                   BASELINE.md)

Flagship config: 960x540, 1000 ORB features, 8 levels (mono_cvcam.cc:78-82).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from orb_slam2_aruco_tpu.config import CameraConfig, SlamConfig
    from orb_slam2_aruco_tpu.io import synthetic
    from orb_slam2_aruco_tpu.pipeline import mapping
    from orb_slam2_aruco_tpu.pipeline.system import SlamSystem, TrackingState

    camc = CameraConfig(
        fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0),
        width=960, height=540,
    )
    cfg = SlamConfig().replace(camera=camc)
    # production detector setting at 960x540: quad proposal at half
    # resolution (decode + subpixel corner refinement stay full-res)
    cfg = cfg.replace(aruco=cfg.aruco.__class__(detect_downsample=2))

    world = synthetic.build_world(
        [3, 17, 42, 99, 7, 23, 55, 88], px_per_m=500.0, spacing=0.6,
        grid_cols=4, marker_size=0.165,
    )
    n_frames = 16
    poses = []
    for i in range(n_frames):
        x = 0.5 + 0.8 * i / n_frames
        yaw = 0.1 * np.sin(2 * np.pi * i / n_frames)
        poses.append(
            synthetic.look_at_plane_pose((x, 0.3), 2.0, yaw=yaw, pitch=0.04)
        )
    frames = [synthetic.render_view(world, camc, R, t) for R, t in poses]

    # Pre-stage frames on device as uint8: this environment reaches the TPU
    # through a low-bandwidth relay (~0.4 MB/s H2D), an artifact of the
    # tunnel, not of the engine or the chip. A production ingest path feeds
    # frames without a per-frame host round trip; the bench measures the
    # engine. (uint8 also quarters the transfer for real hosts.)
    frames_dev = [
        jax.device_put(np.clip(f, 0, 255).astype(np.uint8)) for f in frames
    ]
    np.asarray(frames_dev[0])  # force staging to finish

    # ---- SLAM-mode pass (map building) -----------------------------------
    slam = SlamSystem(cfg)
    for i, img in enumerate(frames_dev):       # warm up all jit paths
        slam.track_monocular(img, ts=i / 30.0)
    assert slam.state is TrackingState.OK, f"bench map build failed: {slam.state}"
    slam2 = SlamSystem(cfg)
    lat = []
    for i in range(2 * n_frames):
        img = frames_dev[i % n_frames]
        t0 = time.perf_counter()
        slam2.track_monocular(img, ts=i / 30.0)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat[4:])                  # drop init frames
    slam_fps = 1.0 / np.mean(lat)
    p50 = float(np.percentile(lat, 50) * 1000)
    p90 = float(np.percentile(lat, 90) * 1000)

    # ---- localization serving pass (headline) ----------------------------
    slam.activate_localization_mode()
    chunk = 16
    # warm up the stream program
    list(slam.localize_stream(
        ((frames_dev[k % n_frames], 0.0) for k in range(chunk)), chunk=chunk))
    n_timed = 96
    t0 = time.perf_counter()
    out = list(slam.localize_stream(
        ((frames_dev[k % n_frames], 0.0) for k in range(n_timed)),
        chunk=chunk))
    dt = time.perf_counter() - t0
    assert len(out) == n_timed and all(p is not None for _, _, p in out)
    fps = n_timed / dt

    # ---- global-BA iteration rate ----------------------------------------
    ba_iters = 30
    _, chi0 = mapping.bundle_adjust(       # warm up the BA program
        slam.map, jnp.asarray(slam.ref_kf), slam.cam, cfg,
        max_cams=cfg.map.max_keyframes, max_pts=8192,
        iters=ba_iters, window_all=True,
    )
    np.asarray(chi0)
    t0 = time.perf_counter()
    _, chi = mapping.bundle_adjust(
        slam.map, jnp.asarray(slam.ref_kf), slam.cam, cfg,
        max_cams=cfg.map.max_keyframes, max_pts=8192,
        iters=ba_iters, window_all=True,
    )
    np.asarray(chi)
    ba_rate = ba_iters / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "tracking_fps_960x540_1000feat",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "slam_fps": round(slam_fps, 2),
                "p50_ms": round(p50, 2),
                "p90_ms": round(p90, 2),
                "ba_iters_per_s": round(ba_rate, 1),
                "chunk": chunk,
            }
        )
    )


if __name__ == "__main__":
    main()
