from orb_slam2_aruco_tpu.ops import image, fast, orb, matching  # noqa: F401
