from orb_slam2_aruco_tpu.ops.aruco import dictionary, detector  # noqa: F401
