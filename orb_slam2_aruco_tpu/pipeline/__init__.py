from orb_slam2_aruco_tpu.pipeline import (  # noqa: F401
    frontend,
    initializer,
    mapping,
    system,
    tracking,
)
