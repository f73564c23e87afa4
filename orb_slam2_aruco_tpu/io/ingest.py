"""Real-data ingestion: video files, image folders, OpenCV camera YAML.

Replaces the reference CLIs' input machinery:
  * createYMLfromOpencvCamera (reference Examples/Monocular/
    mono_cvcam.cc:31-95): OpenCV calibration-file ingestion with optional
    resize rescaling of fx/fy/cx/cy — here it produces a CameraConfig
    directly instead of writing an intermediate ORB-SLAM yml.
  * cv::VideoCapture frame loop (mono_cvcam.cc:115-181) -> VideoSource.
  * LoadImages image-dir + timestamps loader (mono_marker.cc:355-376)
    -> ImageFolderSource.

cv2 is used for decode only (host-side I/O — the reference links all of
OpenCV; this engine keeps it out of the compute path). Every source yields
(gray_uint8 [H, W], timestamp_seconds) resized to the configured geometry.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np

from orb_slam2_aruco_tpu.config import CameraConfig


def _require_cv2():
    try:
        import cv2  # noqa: F401
        return cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "orb_slam2_aruco_tpu.io.ingest needs opencv-python for host-side "
            "video/image decode"
        ) from e


def camera_from_opencv_yaml(path: str,
                            out_size: Optional[Tuple[int, int]] = None,
                            fps: float = 30.0) -> CameraConfig:
    """Parse an OpenCV calibration FileStorage yml/xml (camera_matrix,
    distortion_coefficients, image_width/height) into a CameraConfig,
    rescaling intrinsics when `out_size` = (width, height) differs from the
    calibrated size — exactly createYMLfromOpencvCamera's behavior
    (mono_cvcam.cc:52-61)."""
    cv2 = _require_cv2()
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)
    K = fs.getNode("camera_matrix").mat()
    dist = fs.getNode("distortion_coefficients").mat()
    w = int(fs.getNode("image_width").real())
    h = int(fs.getNode("image_height").real())
    fs.release()
    if K is None or dist is None:
        raise ValueError(f"{path}: missing camera_matrix / "
                         "distortion_coefficients")
    K = K.astype(np.float64)
    d = dist.reshape(-1).astype(np.float64)
    d = np.concatenate([d, np.zeros(max(0, 5 - d.size))])[:5]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if out_size is not None:
        sx = out_size[0] / float(w)
        sy = out_size[1] / float(h)
        fx, cx = fx * sx, cx * sx
        fy, cy = fy * sy, cy * sy
        w, h = out_size
    return CameraConfig(fx=float(fx), fy=float(fy), cx=float(cx),
                        cy=float(cy), dist=tuple(float(v) for v in d),
                        width=int(w), height=int(h), fps=fps)


def camera_from_slam_yaml(path: str) -> CameraConfig:
    """Parse the reference's own ORB-SLAM-style yml (Camera.fx etc., the
    format createYMLfromOpencvCamera writes and Tracking.cc:58-143 reads)."""
    vals = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if ":" not in line or line.startswith("%"):
                continue
            k, v = line.split(":", 1)
            try:
                vals[k.strip()] = float(v.strip())
            except ValueError:
                pass
    need = ["Camera.fx", "Camera.fy", "Camera.cx", "Camera.cy"]
    if any(k not in vals for k in need):
        raise ValueError(f"{path}: missing {need}")
    dist = tuple(vals.get(k, 0.0) for k in
                 ("Camera.k1", "Camera.k2", "Camera.p1", "Camera.p2",
                  "Camera.k3"))
    return CameraConfig(
        fx=vals["Camera.fx"], fy=vals["Camera.fy"], cx=vals["Camera.cx"],
        cy=vals["Camera.cy"], dist=dist,
        width=int(vals.get("Camera.width", 0) or 0) or 960,
        height=int(vals.get("Camera.height", 0) or 0) or 540,
        fps=vals.get("Camera.fps", 30.0),
    )


def _to_gray(frame: np.ndarray, size: Tuple[int, int], cv2) -> np.ndarray:
    if frame.ndim == 3:
        # the reference converts with RGB flag from the yml (Tracking.cc:167)
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    if (frame.shape[1], frame.shape[0]) != size:
        frame = cv2.resize(frame, size, interpolation=cv2.INTER_AREA)
    return np.ascontiguousarray(frame, dtype=np.uint8)


@dataclasses.dataclass
class VideoSource:
    """Video-file frame iterator (mono_cvcam.cc:115-181): resizes to the
    camera geometry, yields (gray uint8, timestamp)."""

    path: str
    camera: CameraConfig

    def __iter__(self) -> Iterator[Tuple[np.ndarray, float]]:
        cv2 = _require_cv2()
        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            raise FileNotFoundError(self.path)
        fps = cap.get(cv2.CAP_PROP_FPS) or self.camera.fps
        size = (self.camera.width, self.camera.height)
        idx = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield _to_gray(frame, size, cv2), idx / max(fps, 1e-6)
            idx += 1
        cap.release()


@dataclasses.dataclass
class ImageFolderSource:
    """Image-directory iterator. With `times_file` it follows the reference
    LoadImages convention (mono_marker.cc:355-376): each line is a stem;
    image = dir/<stem>.png, timestamp = float(stem)/1e6. Without it, images
    are taken in sorted order at the camera fps."""

    path: str
    camera: CameraConfig
    times_file: Optional[str] = None
    ext: str = ".png"

    def _entries(self):
        if self.times_file:
            with open(self.times_file) as f:
                stems = [ln.strip() for ln in f if ln.strip()]
            return [(os.path.join(self.path, s + self.ext), float(s) / 1e6)
                    for s in stems]
        names = sorted(
            n for n in os.listdir(self.path)
            if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
        )
        return [(os.path.join(self.path, n), i / self.camera.fps)
                for i, n in enumerate(names)]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, float]]:
        cv2 = _require_cv2()
        size = (self.camera.width, self.camera.height)
        for fname, ts in self._entries():
            img = cv2.imread(fname, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(fname)
            yield _to_gray(img, size, cv2), ts


class StagedSource:
    """Double-buffered host->device staging: wraps any (frame, ts) iterator
    and yields (device_array, ts) with the NEXT frames' decode + H2D
    transfer overlapping the current frame's compute.

    A background thread drains the wrapped source, issues jax.device_put
    (itself asynchronous) and parks up to `depth` in-flight frames in a
    bounded queue — the production ingest path the reference's frame loop
    (mono_cvcam.cc:141-148) corresponds to, minus any per-frame host sync.
    uint8 staging quarters the transfer vs float32."""

    def __init__(self, source, depth: int = 2, batch: int = 1):
        """depth: in-flight QUEUE ITEMS (batches when batch > 1). batch:
        frames per host->device transfer — on relay-attached TPUs each
        transfer pays a round trip, so staging a whole localization chunk
        as ONE stacked [batch, H, W] put (then yielding zero-copy device
        slices) is dramatically cheaper than per-frame puts; match `batch`
        to the consumer's chunk size and keep depth >= 2 so the next
        chunk's transfer fully overlaps the current chunk's compute."""
        self.source = source
        self.depth = max(1, int(depth))
        self.batch = max(1, int(batch))

    def _pump(self):
        """Start the producer thread; returns a generator over queue items:
        (device_frame, ts) when batch == 1, else (device_stack, ts_list)."""
        import queue as _queue
        import threading

        import jax

        q: "_queue.Queue" = _queue.Queue(maxsize=self.depth)
        _END = object()

        def to_u8(frame):
            arr = np.ascontiguousarray(frame)
            if arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
            return arr

        def producer():
            try:
                if self.batch == 1:
                    for frame, ts in self.source:
                        q.put((jax.device_put(to_u8(frame)), ts))
                else:
                    buf = []
                    for frame, ts in self.source:
                        buf.append((to_u8(frame), ts))
                        if len(buf) == self.batch:
                            stack = jax.device_put(
                                np.stack([f for f, _ in buf])
                            )
                            q.put((stack, [t for _, t in buf]))
                            buf = []
                    if buf:
                        stack = jax.device_put(np.stack([f for f, _ in buf]))
                        q.put((stack, [t for _, t in buf]))
            finally:
                q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        def drain():
            while True:
                item = q.get()
                if item is _END:
                    break
                yield item
            t.join()

        return drain()

    def batches(self):
        """Iterate (device_stack [b, H, W], ts_list) — the whole staged
        batch, un-sliced. The fast path for chunked consumers
        (SlamSystem.localize_stream): per-frame slicing of a device array
        costs one tiny relay dispatch per frame, and the consumer would
        immediately re-stack the slices — dozens of wasted dispatches per
        chunk on relay-attached TPUs."""
        if self.batch == 1:
            raise ValueError("batches() needs batch > 1")
        return self._pump()

    def __iter__(self):
        for item in self._pump():
            if self.batch == 1:
                yield item
            else:
                stack, ts_list = item
                for i, ts in enumerate(ts_list):
                    yield stack[i], ts
