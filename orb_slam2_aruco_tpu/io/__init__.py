from orb_slam2_aruco_tpu.io import synthetic, trajectory  # noqa: F401
