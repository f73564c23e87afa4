from orb_slam2_aruco_tpu.parallel import dist_ba  # noqa: F401
