"""Image-level primitives: pyramid, separable Gaussian blur, box filter.

Replaces cv::resize / cv::GaussianBlur usage in ORBextractor::ComputePyramid
(reference src/ORBextractor.cc:1107-1132). Convolutions are expressed as
lax.conv_general_dilated so XLA maps them onto the MXU.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, num_levels: int, scale: float) -> List[Tuple[int, int]]:
    return [
        (max(8, int(round(h / scale**l))), max(8, int(round(w / scale**l))))
        for l in range(num_levels)
    ]


def build_pyramid(img, num_levels: int, scale: float):
    """img [H, W] float32 in [0, 255] -> list of levels (static shapes)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, num_levels, scale)
    levels = [img]
    for hl, wl in shapes[1:]:
        levels.append(
            jax.image.resize(img, (hl, wl), method="linear", antialias=True)
        )
    return levels


def _conv2d_single(img, kernel):
    """[H, W] x [kh, kw] -> [H, W] same-padding 2D convolution."""
    x = img[None, None, :, :]
    k = kernel[None, None, :, :]
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y[0, 0]


def gaussian_kernel1d(ksize: int, sigma: float):
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum())


def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur (reference blurs each level before BRIEF,
    ORBextractor.cc:1044-1105)."""
    k1 = gaussian_kernel1d(ksize, sigma)
    img = _conv2d_single(img, k1[None, :])
    img = _conv2d_single(img, k1[:, None])
    return img


def box_filter(img, ksize: int):
    """Mean filter via separable uniform kernel (for adaptive thresholding)."""
    k1 = jnp.full((ksize,), 1.0 / ksize, dtype=img.dtype)
    img = _conv2d_single(img, k1[None, :])
    img = _conv2d_single(img, k1[:, None])
    return img


def to_gray(img):
    """[H, W, 3] uint8/float RGB -> [H, W] float32 grayscale (BT.601, matching
    cv::cvtColor in Tracking::GrabImageMonocular, reference Tracking.cc:167)."""
    if img.ndim == 2:
        return img.astype(jnp.float32)
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.einsum("hwc,c->hw", img.astype(jnp.float32), w)
