"""Oriented BRIEF (ORB) descriptors: IC_Angle orientation + rotated 256-bit
binary descriptors.

Replaces ORBextractor's IC_Angle (reference src/ORBextractor.cc:77-104) and
computeOrbDescriptor (:108-147). TPU-first differences:

  * the intensity-centroid moments m10/m01 are computed for the WHOLE image
    with two 31x31 convolutions (MXU) and gathered at keypoints — no per-
    keypoint patch loops;
  * the sampling pattern is NOT the reference's learned bit_pattern_31_
    table (deliberately not copied): it is a deterministic seeded Gaussian
    pattern (BRIEF-style, sigma = patch/5), generated once at import. The
    engine trains/uses its own descriptors end to end (vocabulary included),
    so cross-implementation bit compatibility is not needed.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.ops.image import _conv2d_single

PATCH_RADIUS = 15
NUM_BITS = 256
_PATTERN_SEED = 20260817


@lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32 (x1, y1, x2, y2) offsets in [-13, 13]."""
    rng = np.random.default_rng(_PATTERN_SEED)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(NUM_BITS, 4))
    pts = np.clip(np.round(pts), -(PATCH_RADIUS - 2), PATCH_RADIUS - 2)
    return pts.astype(np.int32)


@lru_cache(maxsize=1)
def _moment_kernels():
    r = PATCH_RADIUS
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    circ = (x * x + y * y <= r * r).astype(np.float32)
    return (
        jnp.asarray(x * circ, dtype=jnp.float32),
        jnp.asarray(y * circ, dtype=jnp.float32),
    )


def orientation_map(img):
    """Per-pixel IC angle: atan2(m01, m10) of the circular 31x31 patch.
    Returns [H, W] float32 radians."""
    kx, ky = _moment_kernels()
    # lax.conv_general_dilated is cross-correlation (cuDNN convention): the
    # kernel is applied unflipped, which is exactly the moment sum we want
    m10 = _conv2d_single(img, kx)
    m01 = _conv2d_single(img, ky)
    return jnp.arctan2(m01, m10)


def keypoint_angles(img, xy):
    """Angles at keypoint positions. xy [N, 2] (x, y) float. Uses the exact
    per-keypoint circular moments via gather-free convolution + nearest
    gather."""
    ang = orientation_map(img)
    h, w = img.shape
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, h - 1)
    return ang[yi, xi]


def describe(img_blurred, xy, angles):
    """256-bit rotated BRIEF. img_blurred [H, W]; xy [N, 2]; angles [N].

    Returns packed descriptors [N, 8] uint32."""
    h, w = img_blurred.shape
    pat = jnp.asarray(brief_pattern())  # [256, 4]
    p1 = pat[:, :2].astype(jnp.float32)  # (x, y)
    p2 = pat[:, 2:].astype(jnp.float32)
    c = jnp.cos(angles)
    s = jnp.sin(angles)

    def rot(p):
        # [N, 256, 2]: steered pattern (same rotation convention as the
        # reference's computeOrbDescriptor: x' = x cos - y sin, y' = x sin + y cos)
        x = p[None, :, 0] * c[:, None] - p[None, :, 1] * s[:, None]
        y = p[None, :, 0] * s[:, None] + p[None, :, 1] * c[:, None]
        return x, y

    x1, y1 = rot(p1)
    x2, y2 = rot(p2)
    gx1 = jnp.clip(jnp.round(xy[:, 0:1] + x1).astype(jnp.int32), 0, w - 1)
    gy1 = jnp.clip(jnp.round(xy[:, 1:2] + y1).astype(jnp.int32), 0, h - 1)
    gx2 = jnp.clip(jnp.round(xy[:, 0:1] + x2).astype(jnp.int32), 0, w - 1)
    gy2 = jnp.clip(jnp.round(xy[:, 1:2] + y2).astype(jnp.int32), 0, h - 1)
    flat = img_blurred.reshape(-1)
    t1 = flat[gy1 * w + gx1]
    t2 = flat[gy2 * w + gx2]
    bits = (t1 < t2).astype(jnp.uint32)  # [N, 256]
    return pack_bits(bits)


def pack_bits(bits):
    """[N, 256] {0,1} -> [N, 8] uint32."""
    n = bits.shape[0]
    b = bits.reshape(n, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(b * weights, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed):
    """[N, 8] uint32 -> [N, 256] float32 in {0, 1}."""
    n = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    b = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(n, 256).astype(jnp.float32)


def unpack_pm1(packed, dtype=jnp.bfloat16):
    """[N, 8] uint32 -> [N, 256] in {-1, +1} (for MXU Hamming-as-matmul)."""
    return (unpack_bits(packed) * 2.0 - 1.0).astype(dtype)


def hamming_popcount(a, b):
    """Exact Hamming distance via XOR+popcount. a [N, 8], b [M, 8] uint32 ->
    [N, M] int32. Reference: ORBmatcher::DescriptorDistance bit hack
    (src/ORBmatcher.cc:1646-1666)."""
    x = jnp.bitwise_xor(a[:, None, :], b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
