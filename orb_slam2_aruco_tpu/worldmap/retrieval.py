"""Place recognition: batched binary-descriptor scoring.

Replaces DBoW2's hierarchical vocabulary + KeyFrameDatabase inverted file
(reference Thirdparty/DBoW2, src/KeyFrameDatabase.cc) with a flat learned-free
quantizer: descriptors are assigned to `num_words` random binary prototypes
by one MXU matmul; a frame's signature is its L2-normalized word histogram;
frame similarity is a dot product. This is the 'batched binary-descriptor
scoring kernel' BASELINE.json's north star names.

The reference's candidate gates (shared words >= 0.8*max, accumulated
covisible-group score >= 0.75*best, src/KeyFrameDatabase.cc:76-197) map to
simple score-threshold selections on the dense score vector.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.ops.orb import unpack_pm1


@lru_cache(maxsize=4)
def prototype_table(num_words: int, seed: int):
    """[W, 256] {-1,+1} random binary prototypes (fixed per run)."""
    rng = np.random.default_rng(seed)
    # numpy, not jnp: a jnp constant created inside a jit trace would leak a
    # tracer through the cache into later traces
    return rng.integers(0, 2, size=(num_words, 256)).astype(np.float32) * 2 - 1


def bow_vector(packed_desc, kp_valid, num_words: int, seed: int = 7):
    """[N, 8] packed descriptors -> [W] L2-normalized word histogram."""
    A = unpack_pm1(packed_desc)  # [N, 256]
    P = jnp.asarray(prototype_table(num_words, seed), dtype=jnp.bfloat16)
    sim = jnp.dot(A, P.T, preferred_element_type=jnp.float32)  # [N, W]
    word = jnp.argmax(sim, axis=-1)
    hist = jax.ops.segment_sum(
        kp_valid.astype(jnp.float32), word, num_segments=num_words
    )
    n = jnp.linalg.norm(hist)
    return hist / jnp.maximum(n, 1e-6)


def score_against_keyframes(bow, kf_bow, kf_valid):
    """Similarity of a query signature against all keyframes: [K]."""
    s = jnp.dot(kf_bow, bow, preferred_element_type=jnp.float32)
    return jnp.where(kf_valid, s, -1.0)


def detect_candidates(
    bow,
    kf_bow,
    kf_valid,
    exclude_mask,
    min_score,
    max_candidates: int = 8,
):
    """Loop/relocalization candidates: top keyframes by BoW score, excluding
    `exclude_mask` (the covisible neighborhood for loops), gated on
    min_score (reference: minScore from covisibles, then 0.75*bestAcc)."""
    s = score_against_keyframes(bow, kf_bow, kf_valid)
    s = jnp.where(exclude_mask, -1.0, s)
    vals, idx = jax.lax.top_k(s, max_candidates)
    best = vals[0]
    keep = (vals >= min_score) & (vals >= 0.75 * best) & (vals > 0)
    return idx, vals, keep
