from orb_slam2_aruco_tpu.worldmap import state, covisibility, retrieval  # noqa: F401
