"""Scatter-free segment reduction for TPU.

XLA lowers scatter/segment_sum on TPU to a serialized update loop — a
0.5M-update segment_sum costs literal seconds. This module computes segment
sums with sort + cumsum + binary search instead: O((E + S) log E) of fully
vectorized work (sort, cumsum, gathers), all TPU-fast.

Precision note: per-segment sums are differences of a running f32 cumsum, so
worst-case error grows with the global sum magnitude rather than the segment
sum. For the BA problem sizes used here (<= ~256k edges) this stays ~1e-4
relative; the LM accept/reject step guards against any resulting bad step.
"""

from __future__ import annotations

import jax.numpy as jnp


def segment_sum_sorted(vals, seg_ids, num_segments: int):
    """Equivalent of jax.ops.segment_sum(vals, seg_ids, num_segments) without
    scatters. seg_ids outside [0, num_segments) contribute nothing.

    vals: [E, ...]; seg_ids: [E] int32. Returns [num_segments, ...]."""
    E = seg_ids.shape[0]
    tail = vals.shape[1:]
    ids = jnp.where(
        (seg_ids >= 0) & (seg_ids < num_segments), seg_ids, num_segments
    )
    perm = jnp.argsort(ids)
    sv = vals.reshape(E, -1)[perm]
    ss = ids[perm]
    cs = jnp.cumsum(sv.astype(jnp.float32), axis=0)
    cs0 = jnp.concatenate([jnp.zeros((1, cs.shape[1]), cs.dtype), cs], axis=0)
    seg_range = jnp.arange(num_segments, dtype=ids.dtype)
    left = jnp.searchsorted(ss, seg_range, side="left")
    right = jnp.searchsorted(ss, seg_range, side="right")
    out = cs0[right] - cs0[left]
    return out.reshape((num_segments,) + tail).astype(vals.dtype)
