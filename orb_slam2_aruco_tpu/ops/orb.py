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
    """[256, 4] float32 (x1, y1, x2, y2) offsets with NORM <= 13 so any
    rotation stays inside a 32x32 patch (offsets -16..15)."""
    rng = np.random.default_rng(_PATTERN_SEED)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(NUM_BITS, 4)).astype(np.float32)
    for cols in ((0, 1), (2, 3)):
        v = pts[:, cols]
        n = np.linalg.norm(v, axis=1, keepdims=True)
        scale = np.minimum(1.0, (PATCH_RADIUS - 2.0) / np.maximum(n, 1e-6))
        pts[:, cols] = v * scale
    return np.round(pts).astype(np.float32)


@lru_cache(maxsize=1)
def _moment_kernels():
    r = PATCH_RADIUS
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    circ = (x * x + y * y <= r * r).astype(np.float32)
    # cached as NUMPY: jnp constants created inside a jit trace would leak
    # tracers through the lru_cache into later traces
    return (
        np.asarray(x * circ, dtype=np.float32),
        np.asarray(y * circ, dtype=np.float32),
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


@lru_cache(maxsize=1)
def _moment_kernels_patch32():
    """Moment kernels embedded in a flattened 32x32 patch with the keypoint
    at (16, 16) — IC angle becomes two [N,1024]x[1024] matvecs instead of two
    31x31 full-image convolutions per pyramid level."""
    y, x = np.mgrid[0:32, 0:32]
    dx = (x - 16).astype(np.float32)
    dy = (y - 16).astype(np.float32)
    circ = (dx * dx + dy * dy <= 15 * 15).astype(np.float32)
    # numpy, not jnp: see _moment_kernels
    return (
        np.asarray((dx * circ).reshape(-1), dtype=np.float32),
        np.asarray((dy * circ).reshape(-1), dtype=np.float32),
    )


def keypoint_angles(img, xy):
    """IC angles at keypoint positions (reference IC_Angle,
    ORBextractor.cc:77-104). xy [N, 2] (x, y) float."""
    return angles_from_patches(extract_patches(img, xy))


def angles_from_patches(patches):
    """IC angle from pre-extracted [N, 32, 32] patches — patch extraction
    (a windowed gather) is the expensive part on TPU, so callers that also
    compute descriptors extract ONCE and feed both stages (frontend)."""
    n = patches.shape[0]
    kx, ky = _moment_kernels_patch32()
    flat = patches.reshape(n, -1)
    m10 = flat @ jnp.asarray(kx)
    m01 = flat @ jnp.asarray(ky)
    return jnp.arctan2(m01, m10)


ANGLE_BINS = 32
_PATCH = 32          # patch covers offsets -16..15 around the keypoint
_PATCH_C = 16.0      # patch-local coordinates of the keypoint


@lru_cache(maxsize=1)
def _steered_sep_tables():
    """Separable steered-BRIEF bilinear taps: ([B, 512, 32], [B, 512, 32])
    row/column 2-tap weight tables per angle bin. A bilinear read is the
    outer product of its row and column taps, so sampling all 512 pattern
    points of keypoint n at ITS angle bin is
        tmp = Wy[bin_n] @ patch_n        ([512, 32] @ [32, 32], MXU)
        s   = sum(tmp * Wx[bin_n], -1)
    — exact 4-tap bilinear, but ~0.5 MFLOP per keypoint instead of the
    33 MFLOP of the earlier all-bins [B*512, 1024] contraction (which
    computed every angle bin and then kept one: a 32x waste that made
    descriptor extraction the frontend's dominant cost). Random-index
    gathers stay out of the picture — XLA:TPU serializes them."""
    pat = brief_pattern()  # [256, 4]
    pts = np.concatenate([pat[:, :2], pat[:, 2:]], axis=0)  # [512, 2] (x, y)
    Wy = np.zeros((ANGLE_BINS, 512, _PATCH), np.float32)
    Wx = np.zeros((ANGLE_BINS, 512, _PATCH), np.float32)
    for b in range(ANGLE_BINS):
        th = 2.0 * np.pi * b / ANGLE_BINS
        c, s = np.cos(th), np.sin(th)
        # same steering convention as the reference computeOrbDescriptor:
        # x' = x cos - y sin, y' = x sin + y cos
        rx = pts[:, 0] * c - pts[:, 1] * s + _PATCH_C
        ry = pts[:, 0] * s + pts[:, 1] * c + _PATCH_C
        x0 = np.clip(np.floor(rx).astype(int), 0, _PATCH - 2)
        y0 = np.clip(np.floor(ry).astype(int), 0, _PATCH - 2)
        fx = np.clip(rx - x0, 0.0, 1.0)
        fy = np.clip(ry - y0, 0.0, 1.0)
        k = np.arange(512)
        Wx[b, k, x0] = 1.0 - fx
        Wx[b, k, x0 + 1] = fx
        Wy[b, k, y0] = 1.0 - fy
        Wy[b, k, y0 + 1] = fy
    # numpy, not jnp: see _moment_kernels
    return Wy, Wx


def extract_patches(img, xy, patch: int = _PATCH):
    """[N, patch, patch] patches (top-left at kp - patch/2). On TPU this is
    a Pallas kernel (level in VMEM, per-keypoint VMEM copies driven by
    scalar-prefetched coords — ops/pallas_patches.py): XLA's lowering of a
    dynamic-slice batch is a windowed gather that measured ~1.4 ms/frame
    over the 8-level pyramid. Elsewhere: plain vmapped dynamic_slice."""
    h, w = img.shape
    x0 = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32) - patch // 2, 0, w - patch)
    y0 = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32) - patch // 2, 0, h - patch)

    if jax.default_backend() == "tpu":
        from orb_slam2_aruco_tpu.ops.pallas_patches import (
            extract_patches_pallas,
        )

        return extract_patches_pallas(img.astype(jnp.float32), y0, x0,
                                      patch=patch)

    def slice_one(y, x):
        return jax.lax.dynamic_slice(img, (y, x), (patch, patch))

    return jax.vmap(slice_one)(y0, x0)


def describe(img_blurred, xy, angles):
    """256-bit rotated BRIEF. img_blurred [H, W]; xy [N, 2]; angles [N].
    Returns packed descriptors [N, 8] uint32."""
    return describe_patches(extract_patches(img_blurred, xy), angles)


def describe_patches(patches, angles):
    """Rotated BRIEF from pre-extracted [N, 32, 32] patches (see
    angles_from_patches for why callers pre-extract)."""
    n = patches.shape[0]
    Wy_np, Wx_np = _steered_sep_tables()
    bins = jnp.mod(
        jnp.round(angles * (ANGLE_BINS / (2.0 * jnp.pi))).astype(jnp.int32),
        ANGLE_BINS,
    )
    Wy = jnp.asarray(Wy_np, dtype=jnp.bfloat16)[bins]          # [N, 512, 32]
    Wx = jnp.asarray(Wx_np, dtype=jnp.bfloat16)[bins]
    tmp = jnp.einsum(
        "nsr,nrc->nsc", Wy, patches.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )                                                          # [N, 512, 32]
    sel = jnp.sum(tmp * Wx.astype(jnp.float32), axis=-1)       # [N, 512]
    bits = (sel[:, :256] < sel[:, 256:]).astype(jnp.uint32)
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
