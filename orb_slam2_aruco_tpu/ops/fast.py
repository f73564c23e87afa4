"""FAST-9/16 corner detection, fully data-parallel over the image.

Replaces cv::FAST as used by ORBextractor::ComputeKeyPointsOctTree (reference
src/ORBextractor.cc:765-853). Instead of per-cell scalar loops + quad-tree
balancing (DistributeOctTree, ORBextractor.cc:539-763), the whole image is
evaluated at once on the VPU and spatial balancing becomes per-cell top-k —
the same goal (even keypoint coverage) expressed as a fixed-shape reduction.

The dual threshold scheme (20 then 7 for starved cells, ORBextractor.cc:
809-816) becomes: corners at the low threshold everywhere, but a score bonus
for passing the high threshold — cells keep high-threshold corners first and
fall back to low-threshold ones, with no second pass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3 (row, col offsets), standard FAST-16 order
_CIRCLE = np.asarray(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one pyramid level."""

    xy: jnp.ndarray      # [N, 2] float32 (x, y) in level coords
    score: jnp.ndarray   # [N]
    valid: jnp.ndarray   # [N] bool


def _fast_scores(img, thresholds):
    """FAST-9/16 corner scores for every pixel at MULTIPLE thresholds in one
    pass (the 16 circle shifts are computed once).

    Returns a list of [H, W] float32 maps: 0 for non-corners, else a contrast
    score (sum of max(|I_c - I_p| - t, 0) over the circle)."""
    h, w = img.shape
    # 16 shifted copies; roll is fine because the 3px border is masked out
    shifted = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)) for dy, dx in _CIRCLE],
        axis=0,
    )  # [16, H, W]
    d = shifted - img[None]
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)

    def arc9(mask):
        # contiguous arc of >= 9 on the circular axis via doubling
        w2 = mask & jnp.roll(mask, -1, axis=0)
        w4 = w2 & jnp.roll(w2, -2, axis=0)
        w8 = w4 & jnp.roll(w4, -4, axis=0)
        w9 = w8 & jnp.roll(mask, -8, axis=0)
        return jnp.any(w9, axis=0)

    outs = []
    for t in thresholds:
        bright = d > t
        dark = d < -t
        is_bright = arc9(bright)
        is_dark = arc9(dark)
        sb = jnp.sum(jnp.maximum(d - t, 0.0), axis=0)
        sd = jnp.sum(jnp.maximum(-d - t, 0.0), axis=0)
        score = jnp.where(is_bright, sb, 0.0) + jnp.where(is_dark, sd, 0.0)
        outs.append(jnp.where((is_bright | is_dark) & border, score, 0.0))
    return outs


def fast_score_map(img, threshold: float):
    """FAST-9/16 corner score for every pixel (single threshold)."""
    return _fast_scores(img, [threshold])[0]


def nms3x3(score):
    """3x3 non-max suppression: keep pixels that are the strict max of their
    neighborhood."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def detect_level(
    img,
    threshold_high: float,
    threshold_low: float,
    cell_size: int,
    per_cell_k: int,
    max_kps: int,
    edge_margin: int = 16,
    use_pallas: bool | None = None,
) -> Keypoints:
    """Detect FAST corners on one pyramid level with spatial balancing.

    The high/low-threshold fallback and octree distribution of the reference
    become: score at low threshold, +bonus if above high threshold, per-cell
    top-k, then global top-max_kps.

    On TPU the score+NMS+bonus stage runs as one fused Pallas kernel
    (ops/pallas_fast.py — bit-packed arc test, no [16, H, W] stacks);
    `use_pallas=None` selects it automatically on the TPU backend.
    """
    h, w = img.shape
    BONUS = 1e6
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from orb_slam2_aruco_tpu.ops.pallas_fast import fast_score_nms

        s = fast_score_nms(img, threshold_high, threshold_low,
                           interpret=jax.default_backend() != "tpu")
    else:
        s_high, s_low = _fast_scores(img, [threshold_high, threshold_low])
        s = nms3x3(s_low)
        # large additive bonus: any high-threshold corner outranks every
        # low-threshold-only corner (reference prefers t=20 detections)
        s = jnp.where((s > 0) & (s_high > 0), s + BONUS, s)
    # zero out the descriptor border
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (yy >= edge_margin) & (yy < h - edge_margin)
        & (xx >= edge_margin) & (xx < w - edge_margin)
    )
    s = jnp.where(inside, s, 0.0)

    # pad to cell multiples
    ch = -(-h // cell_size) * cell_size
    cw = -(-w // cell_size) * cell_size
    sp = jnp.zeros((ch, cw), dtype=s.dtype).at[:h, :w].set(s)
    ncy, ncx = ch // cell_size, cw // cell_size
    cells = sp.reshape(ncy, cell_size, ncx, cell_size).transpose(0, 2, 1, 3)
    cells = cells.reshape(ncy * ncx, cell_size * cell_size)
    topv, topi = jax.lax.top_k(cells, per_cell_k)  # [ncells, k]
    # decode cell-local indices to global coords
    cy = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, per_cell_k), 0) // ncx
    cx = jax.lax.broadcasted_iota(jnp.int32, (ncy * ncx, per_cell_k), 0) % ncx
    ly = topi // cell_size
    lx = topi % cell_size
    gy = cy * cell_size + ly
    gx = cx * cell_size + lx
    flat_v = topv.reshape(-1)
    flat_y = gy.reshape(-1)
    flat_x = gx.reshape(-1)
    n_cand = flat_v.shape[0]
    k = min(max_kps, n_cand)
    vals, idx = jax.lax.top_k(flat_v, k)
    sel_y = flat_y[idx]
    sel_x = flat_x[idx]
    valid = vals > 0
    xy = jnp.stack([sel_x.astype(jnp.float32), sel_y.astype(jnp.float32)], axis=-1)
    if k < max_kps:
        pad = max_kps - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), dtype=xy.dtype)], axis=0)
        vals = jnp.concatenate([vals, jnp.zeros((pad,), dtype=vals.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), dtype=bool)], axis=0)
    score = jnp.where(vals > BONUS / 2, vals - BONUS, vals)
    return Keypoints(xy=xy, score=score, valid=valid)
