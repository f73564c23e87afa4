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


def detect_candidates_grouped(
    bow,
    kf_bow,
    kf_valid,
    covis_w,               # [K, K] covisibility weights (shared points)
    exclude_mask,
    min_score,
    max_candidates: int = 8,
    group_size: int = 10,
    shared_word_frac: float = 0.8,
    acc_frac: float = 0.75,
):
    """Reference-faithful candidate selection (KeyFrameDatabase::Detect-
    LoopCandidates / DetectRelocalizationCandidates, src/KeyFrameDatabase.cc
    :76-197):

      1. shared-word gate: candidates must share >= 0.8x the maximum number
         of active words with the query (the inverted-file commonWords
         count becomes an AND of binarized signatures — one matmul);
      2. per-candidate score >= min_score;
      3. scores accumulate over each candidate's top-`group_size` covisible
         group, and only groups with accScore >= 0.75 * bestAccScore
         survive — a single aliased keyframe cannot outvote a consistent
         neighborhood.

    Returns (idx [C], acc_vals [C], keep [C])."""
    K = kf_valid.shape[0]
    s = score_against_keyframes(bow, kf_bow, kf_valid)
    ok = kf_valid & ~exclude_mask
    # shared active words (both histograms nonzero at the word)
    shared = jnp.dot(
        (kf_bow > 0).astype(jnp.float32), (bow > 0).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )                                                    # [K]
    max_shared = jnp.max(jnp.where(ok, shared, 0.0))
    cand = ok & (shared >= shared_word_frac * max_shared) & (s >= min_score)
    s_c = jnp.where(cand, s, 0.0)
    # top-`group_size` covisible group of every keyframe (masked one-hot)
    gs = min(group_size, K)
    _, top_idx = jax.lax.top_k(covis_w, gs)              # [K, gs]
    w_pos = jnp.take_along_axis(covis_w, top_idx, axis=1) > 0
    group = jnp.zeros((K, K), bool)
    group = group.at[
        jnp.arange(K)[:, None], top_idx
    ].max(w_pos)
    group = group | jnp.eye(K, dtype=bool)
    acc = jnp.dot(
        group.astype(jnp.float32), s_c, preferred_element_type=jnp.float32
    )                                                    # [K]
    acc = jnp.where(cand, acc, -1.0)
    best_acc = jnp.max(acc)
    keep_k = cand & (acc >= acc_frac * best_acc) & (acc > 0)
    score_final = jnp.where(keep_k, s, -1.0)
    vals, idx = jax.lax.top_k(score_final, max_candidates)
    keep = vals > 0
    return idx, jnp.maximum(acc[idx], vals), keep
