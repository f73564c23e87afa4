from orb_slam2_aruco_tpu.viz import framedrawer  # noqa: F401
