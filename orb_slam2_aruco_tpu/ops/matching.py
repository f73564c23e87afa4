"""Batched descriptor matching — the TPU replacement for all 12 ORBmatcher
search/fuse entry points (reference src/ORBmatcher.h:48-83).

Core idea: Hamming distance as an MXU matmul. With descriptors unpacked to
{-1,+1}^256 in bfloat16, dist(a, b) = (256 - <a, b>) / 2, so a full NxM
distance matrix is one [N,256]x[256,M] matmul — speed-of-light on the MXU vs
the reference's per-pair popcount loops. Search-window / scale / grid
constraints (Frame::GetFeaturesInArea, reference src/Frame.cc:280-333) become
additive masks on the distance matrix; the rotation-consistency histogram
(ORBmatcher HISTO_LENGTH=30, src/ORBmatcher.cc:37-39) is a fixed-shape
segment reduction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.ops.orb import unpack_pm1

INF = 1e9


class Matches(NamedTuple):
    idx: jnp.ndarray       # [N] int32 index into B (-1 if unmatched)
    dist: jnp.ndarray      # [N] float32 Hamming distance of the match
    valid: jnp.ndarray     # [N] bool


def distance_matrix(packed_a, packed_b, mask_a=None, mask_b=None):
    """Hamming distances [N, M] via MXU matmul."""
    A = unpack_pm1(packed_a)
    B = unpack_pm1(packed_b)
    d = (256.0 - jnp.dot(A, B.T, preferred_element_type=jnp.float32)) * 0.5
    if mask_a is not None:
        d = jnp.where(mask_a[:, None], d, INF)
    if mask_b is not None:
        d = jnp.where(mask_b[None, :], d, INF)
    return d


def nn_match(
    dist,                 # [N, M] distance matrix (masked entries = INF)
    max_dist: float,
    nn_ratio: float = 1.0,
    mutual: bool = False,
) -> Matches:
    """Row-wise nearest neighbor with Lowe ratio and optional mutual check."""
    neg = -dist
    vals2, idx2 = jax.lax.top_k(neg, 2)
    best = -vals2[:, 0]
    second = -vals2[:, 1]
    idx = idx2[:, 0]
    ok = (best <= max_dist) & (best <= nn_ratio * second)
    if mutual:
        back = jnp.argmin(dist, axis=0)  # [M] best row for each col
        ok = ok & (back[idx] == jnp.arange(dist.shape[0]))
    # resolve duplicate column assignments: keep the row with min distance
    # for each chosen column (scatter-min)
    M = dist.shape[1]
    col_best = jnp.full((M,), INF).at[idx].min(jnp.where(ok, best, INF))
    ok = ok & (best <= col_best[idx])
    return Matches(
        idx=jnp.where(ok, idx, -1), dist=best, valid=ok
    )


def window_mask(pos_a, pos_b, radius, octave_a=None, octave_b=None,
                max_octave_diff: int = 1):
    """[N, M] bool: b within `radius` pixels of a's predicted position.
    radius may be scalar or per-row [N] (scale-dependent search windows).
    Octave constraint mirrors the reference's minLevel/maxLevel gates.

    |a-b|^2 expands to |a|^2 + |b|^2 - 2<a,b> so the [N, M] distance grid is
    one MXU matmul — materializing the [N, M, 2] difference tensor costs
    more HBM traffic than everything else in the matcher combined."""
    na = jnp.sum(pos_a * pos_a, axis=-1)                  # [N]
    nb = jnp.sum(pos_b * pos_b, axis=-1)                  # [M]
    cross = jnp.dot(pos_a, pos_b.T, preferred_element_type=jnp.float32)
    d2 = na[:, None] + nb[None, :] - 2.0 * cross
    r = jnp.asarray(radius)
    if r.ndim == 0:
        r2 = r * r
        m = d2 <= r2
    else:
        m = d2 <= (r * r)[:, None]
    if octave_a is not None and octave_b is not None:
        do = jnp.abs(octave_a[:, None] - octave_b[None, :])
        m = m & (do <= max_octave_diff)
    return m


def rotation_consistency(
    angles_a, angles_b, matches: Matches, histo_length: int = 30, keep_bins: int = 3
):
    """Keep only matches whose rotation offset falls in the `keep_bins` most
    popular histogram bins (reference ComputeThreeMaxima, ORBmatcher.cc)."""
    idx_safe = jnp.maximum(matches.idx, 0)
    rot = angles_a - angles_b[idx_safe]
    rot = jnp.mod(rot, 2.0 * jnp.pi)
    bins = jnp.floor(rot * histo_length / (2.0 * jnp.pi)).astype(jnp.int32)
    bins = jnp.clip(bins, 0, histo_length - 1)
    w = matches.valid.astype(jnp.float32)
    hist = jax.ops.segment_sum(w, bins, num_segments=histo_length)
    top_vals, top_bins = jax.lax.top_k(hist, keep_bins)
    # secondary bins only count if they hold >= 10% of the best bin
    # (reference ComputeThreeMaxima discards max2/max3 below 0.1*max1)
    bin_ok = top_vals >= 0.1 * top_vals[0]
    in_top = jnp.any(
        (bins[:, None] == top_bins[None, :]) & bin_ok[None, :], axis=-1
    )
    ok = matches.valid & in_top
    return Matches(idx=jnp.where(ok, matches.idx, -1), dist=matches.dist, valid=ok)


def match_in_window(
    packed_a, packed_b, pos_pred_a, pos_b, radius,
    mask_a=None, mask_b=None,
    octave_a=None, octave_b=None, max_octave_diff: int = 1,
    max_dist: float = 100.0, nn_ratio: float = 1.0, mutual: bool = False,
    angles_a=None, angles_b=None, check_rotation: bool = False,
    histo_length: int = 30,
) -> Matches:
    """The workhorse: projection-window constrained NN matching.

    Covers SearchByProjection (all 4 overloads), SearchForInitialization and
    the window searches inside SearchForTriangulation — differences between
    those reference entry points are expressed by the caller through
    radius / masks / thresholds (see pipeline/tracking.py call sites).
    """
    d = distance_matrix(packed_a, packed_b, mask_a, mask_b)
    wm = window_mask(pos_pred_a, pos_b, radius, octave_a, octave_b, max_octave_diff)
    d = jnp.where(wm, d, INF)
    m = nn_match(d, max_dist=max_dist, nn_ratio=nn_ratio, mutual=mutual)
    if check_rotation and angles_a is not None:
        m = rotation_consistency(angles_a, angles_b, m, histo_length)
    return m
