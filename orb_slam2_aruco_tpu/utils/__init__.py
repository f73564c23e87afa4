from orb_slam2_aruco_tpu.utils.telemetry import FrameTimer, device_trace

__all__ = ["FrameTimer", "device_trace"]
