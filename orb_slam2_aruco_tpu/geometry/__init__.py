from orb_slam2_aruco_tpu.geometry import lie, camera, triangulate, horn, ippe, twoview  # noqa: F401
