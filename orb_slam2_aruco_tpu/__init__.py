"""orb_slam2_aruco_tpu — a TPU-native monocular SLAM engine with ArUco fiducials.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
ORB_SLAM2_aruco (CarminLiu/ORB_SLAM2_aruco): ORB-feature visual SLAM extended
with ArUco square fiducial markers as first-class SE3 landmarks, giving metric
scale, drift correction, and an appearance-independent tracking /
relocalization / loop-closure signal.

Design stance (not a port):
  * one functional core — the world map is a pytree of fixed-capacity arrays
    with validity masks, advanced by jitted steps;
  * batched Levenberg–Marquardt with Schur complement replaces g2o;
  * Pallas/XLA kernels (FAST corners, oriented BRIEF, MXU Hamming matching,
    ArUco detection/decoding, IPPE planar pose) replace the per-pixel C++;
  * multi-chip scaling via jax.sharding Mesh + collectives replaces the
    4-thread/mutex fabric of the reference (reference: src/System.cc:96-108).
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, float32 dot/einsum lowers to fast bfloat16 MXU passes by default.
# That is exactly right for the descriptor kernels (which feed bf16 inputs
# explicitly) but silently destroys the Levenberg–Marquardt normal equations
# and geometry solves (reference parity requires f32-or-better there —
# SURVEY.md §7 'numerical parity'). Force full-precision f32 matmuls as the
# default; perf-critical kernels opt back into bf16 by passing bf16 operands.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: TPU compiles in this environment go through a
# slow remote-compile relay (~1-2 min per computation); caching executables on
# disk makes repeated runs start in seconds.
import os as _os

_cache_dir = _os.environ.get("ORB_SLAM2_ARUCO_TPU_CACHE",
                             _os.path.expanduser("~/.cache/jax_comp"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never a hard dependency
    pass

from orb_slam2_aruco_tpu.config import SlamConfig  # noqa: F401
