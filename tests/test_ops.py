"""Golden tests for the front-end kernels: FAST, ORB, Hamming matching
(SURVEY.md §4: FAST truth tables, BRIEF on synthetic patches, Hamming
matcher)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.ops import fast, image, matching, orb


def square_grid(h=128, w=128, sq=10, step=24):
    """Isolated bright squares on dark background: every square corner is an
    L-junction, a textbook FAST corner (unlike checkerboard saddle points,
    which FAST-9 by design does NOT fire on)."""
    img = np.zeros((h, w), np.float32)
    for y0 in range(8, h - sq - 8, step):
        for x0 in range(8, w - sq - 8, step):
            img[y0 : y0 + sq, x0 : x0 + sq] = 255.0
    return img


def test_fast_finds_square_corners():
    img = jnp.asarray(square_grid())
    s = fast.fast_score_map(img, 20.0)
    s = fast.nms3x3(s)
    ys, xs = np.nonzero(np.asarray(s) > 0)
    assert len(ys) >= 50  # 25 squares x 4 corners, NMS may merge a few
    # every detection is near a square corner (corners at y0/x0 {8,32,...}
    # + {0, 9} offsets)
    for y, x in zip(ys, xs):
        dy = min((y - 8) % 24, (-(y - 8 - 9)) % 24)
        dx = min((x - 8) % 24, (-(x - 8 - 9)) % 24)
        assert min(dy, 24 - dy) <= 3 and min(dx, 24 - dx) <= 3, (y, x)


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    s = fast.fast_score_map(img, 7.0)
    assert float(jnp.sum(s)) == 0.0


def test_detect_level_caps_and_balances():
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        np.kron(rng.uniform(0, 255, (16, 16)), np.ones((8, 8))).astype(np.float32)
    )
    kp = fast.detect_level(img, 20.0, 7.0, cell_size=32, per_cell_k=8, max_kps=64)
    assert kp.xy.shape == (64, 2)
    n = int(jnp.sum(kp.valid))
    assert n > 10
    # all valid keypoints inside margins
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    assert xy.min() >= 16 and xy.max() < 128 - 16


def test_orientation_rotates():
    # a patch with a bright blob offset to the right -> angle ~ 0;
    # offset down -> angle ~ pi/2 (y down convention)
    img = np.full((64, 64), 50.0, np.float32)
    img[30:35, 40:45] = 250.0  # blob to the right of (32, 32)
    a_right = float(orb.keypoint_angles(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))[0])
    img2 = np.full((64, 64), 50.0, np.float32)
    img2[40:45, 30:35] = 250.0  # blob below
    a_down = float(orb.keypoint_angles(jnp.asarray(img2), jnp.asarray([[32.0, 32.0]]))[0])
    assert abs(a_right) < 0.4
    assert abs(a_down - np.pi / 2) < 0.4


def test_brief_deterministic_and_discriminative(rng):
    img = jnp.asarray(rng.uniform(0, 255, (128, 128)).astype(np.float32))
    blurred = image.gaussian_blur(img)
    xy = jnp.asarray(rng.uniform(20, 108, size=(32, 2)).astype(np.float32))
    ang = orb.keypoint_angles(img, xy)
    d1 = orb.describe(blurred, xy, ang)
    d2 = orb.describe(blurred, xy, ang)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    dist = orb.hamming_popcount(d1, d1)
    dd = np.asarray(dist)
    assert np.all(np.diag(dd) == 0)
    off = dd[~np.eye(32, dtype=bool)]
    assert off.min() > 60  # random keypoints should be far apart


def test_brief_rotation_invariance(rng):
    # rotating the image by 90 deg should leave descriptors roughly invariant
    img = np.asarray(
        image.gaussian_blur(
            jnp.asarray(rng.uniform(0, 255, (128, 128)).astype(np.float32)), 7, 2.0
        )
    )
    img_rot = np.rot90(img, -1).copy()  # CW rotation
    # keypoint at (x, y) maps to (w-1-y, x) under CW rot90
    pts = rng.uniform(30, 98, size=(16, 2)).astype(np.float32)
    pts_rot = np.stack([127 - pts[:, 1], pts[:, 0]], axis=-1)
    a1 = orb.keypoint_angles(jnp.asarray(img), jnp.asarray(pts))
    a2 = orb.keypoint_angles(jnp.asarray(img_rot), jnp.asarray(pts_rot))
    d1 = orb.describe(jnp.asarray(img), jnp.asarray(pts), a1)
    d2 = orb.describe(jnp.asarray(img_rot), jnp.asarray(pts_rot), a2)
    d = np.diag(np.asarray(orb.hamming_popcount(d1, d2)))
    # steered BRIEF: not exact, but matched points must be far below random
    assert np.median(d) < 60, d


def test_pack_unpack_roundtrip(rng):
    bits = jnp.asarray(rng.integers(0, 2, size=(16, 256)), dtype=jnp.uint32)
    packed = orb.pack_bits(bits)
    unpacked = orb.unpack_bits(packed)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(bits))


def test_hamming_matmul_equals_popcount(rng):
    a = orb.pack_bits(jnp.asarray(rng.integers(0, 2, (24, 256)), dtype=jnp.uint32))
    b = orb.pack_bits(jnp.asarray(rng.integers(0, 2, (31, 256)), dtype=jnp.uint32))
    d_pop = np.asarray(orb.hamming_popcount(a, b))
    d_mm = np.asarray(matching.distance_matrix(a, b))
    np.testing.assert_allclose(d_mm, d_pop, atol=0.01)


def test_nn_match_with_known_correspondence(rng):
    base = rng.integers(0, 2, (40, 256))
    # b = permuted a with a few bit flips
    perm = rng.permutation(40)
    noisy = base[perm].copy()
    flips = rng.integers(0, 256, size=(40, 10))
    for i in range(40):
        noisy[i, flips[i]] ^= 1
    a = orb.pack_bits(jnp.asarray(base, dtype=jnp.uint32))
    b = orb.pack_bits(jnp.asarray(noisy, dtype=jnp.uint32))
    d = matching.distance_matrix(a, b)
    m = matching.nn_match(d, max_dist=50.0, nn_ratio=0.9, mutual=True)
    idx = np.asarray(m.idx)
    ok = np.asarray(m.valid)
    assert ok.sum() >= 38
    inv = np.empty(40, dtype=int)
    inv[perm] = np.arange(40)
    np.testing.assert_array_equal(idx[ok], inv[np.nonzero(ok)[0]])


def test_window_mask_limits_candidates():
    pos_a = jnp.asarray([[10.0, 10.0], [50.0, 50.0]])
    pos_b = jnp.asarray([[12.0, 10.0], [80.0, 80.0], [49.0, 52.0]])
    m = matching.window_mask(pos_a, pos_b, 5.0)
    np.testing.assert_array_equal(
        np.asarray(m), [[True, False, False], [False, False, True]]
    )


def test_rotation_consistency_filters_outliers(rng):
    n = 50
    angles_a = jnp.asarray(rng.uniform(0, 2 * np.pi, n), dtype=jnp.float32)
    # consistent rotation offset of 0.5 rad except 5 outliers
    offs = np.full(n, 0.5, np.float32)
    offs[:5] = rng.uniform(1.5, 3.0, 5)
    angles_b = angles_a - jnp.asarray(offs)
    matches = matching.Matches(
        idx=jnp.arange(n, dtype=jnp.int32),
        dist=jnp.zeros(n),
        valid=jnp.ones(n, dtype=bool),
    )
    out = matching.rotation_consistency(angles_a, angles_b, matches)
    ok = np.asarray(out.valid)
    assert ok[5:].all()
    assert ok[:5].sum() <= 1


def test_pallas_patch_extraction_matches_dynamic_slice(rng):
    """The Pallas patch-extraction kernel (ops/pallas_patches.py, TPU path
    of orb.extract_patches) must reproduce the vmapped-dynamic_slice
    reference exactly, including unaligned offsets and border clipping."""
    import jax
    import jax.numpy as jnp

    from orb_slam2_aruco_tpu.ops.pallas_patches import extract_patches_pallas

    img = jnp.asarray(rng.uniform(0, 255, (123, 217)).astype(np.float32))
    # include aligned, unaligned, and border-clipped offsets
    y0 = jnp.asarray(
        np.concatenate([[0, 8, 91, 90], rng.integers(0, 123 - 32, 28)]),
        jnp.int32,
    )
    x0 = jnp.asarray(
        np.concatenate([[0, 128, 185, 1], rng.integers(0, 217 - 32, 28)]),
        jnp.int32,
    )
    out = extract_patches_pallas(img, y0, x0, interpret=True)
    ref = jnp.stack([
        jax.lax.dynamic_slice(img, (int(y), int(x)), (32, 32))
        for y, x in zip(y0, x0)
    ])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
