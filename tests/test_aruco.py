"""ArUco dictionary + detector tests against the synthetic renderer
(SURVEY.md §4: IPPE on synthetic square projections; detector golden tests)."""

import jax.numpy as jnp
import pytest
import numpy as np

from orb_slam2_aruco_tpu.config import CameraConfig
from orb_slam2_aruco_tpu.geometry import ippe
from orb_slam2_aruco_tpu.io import synthetic
from orb_slam2_aruco_tpu.ops.aruco import detector, dictionary

CAM = CameraConfig(
    fx=300.0, fy=300.0, cx=160.0, cy=120.0, dist=(0, 0, 0, 0, 0),
    width=320, height=240,
)


def test_dictionary_aruco_classic():
    d = dictionary.get_dictionary("ARUCO")
    assert d.num_ids == 1024 and d.nbits == 25
    # codes unique
    flat = {tuple(c) for c in d.codes}
    assert len(flat) == 1024


def test_dictionary_decode_with_rotation():
    d = dictionary.get_dictionary("ARUCO")
    code = d.bit_matrix(137)
    for r in range(4):
        rot = np.rot90(code, -r).reshape(1, -1).astype(np.float32)
        ids, rots, dist = dictionary.decode_bits(jnp.asarray(rot), "ARUCO")
        assert int(ids[0]) == 137
        assert int(rots[0]) == r
        assert float(dist[0]) == 0.0


def test_generated_dictionary_min_distance():
    d = dictionary.get_dictionary("TPU_25h7")
    assert d.num_ids >= 50
    # spot-check pairwise rotation-distance >= 7
    rng = np.random.default_rng(0)
    for _ in range(50):
        i, j = rng.integers(0, d.num_ids, 2)
        if i == j:
            continue
        ci = d.bit_matrix(i)
        best = min(
            int((np.rot90(ci, -r) != d.bit_matrix(j)).sum()) for r in range(4)
        )
        assert best >= 7


def _render_frontal(ids=(3, 17, 42, 99), distance=1.2, yaw=0.0, pitch=0.0):
    world = synthetic.build_world(list(ids), px_per_m=700.0, spacing=0.45,
                                  grid_cols=2)
    Rcw, tcw = synthetic.look_at_plane_pose((0.22, 0.22), distance, yaw=yaw,
                                            pitch=pitch)
    img = synthetic.render_view(world, CAM, Rcw, tcw)
    return world, img, Rcw, tcw


def _project(cam: CameraConfig, Rcw, tcw, xyz):
    p = xyz @ Rcw.T + tcw
    return np.stack(
        [cam.fx * p[:, 0] / p[:, 2] + cam.cx, cam.fy * p[:, 1] / p[:, 2] + cam.cy],
        axis=-1,
    )


def test_detect_frontal_markers():
    world, img, Rcw, tcw = _render_frontal()
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=32,
                                  min_area=80.0)
    found = {int(i) for i in np.asarray(det.ids) if i >= 0}
    assert found == {3, 17, 42, 99}, found


def test_detect_corner_accuracy_and_order():
    world, img, Rcw, tcw = _render_frontal()
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=32,
                                  min_area=80.0)
    ids = np.asarray(det.ids)
    corners = np.asarray(det.corners)
    for spec in world.markers:
        k = np.nonzero(ids == spec.marker_id)[0]
        assert len(k) == 1
        uv_det = corners[k[0]]
        uv_gt = _project(CAM, Rcw, tcw, world.marker_corners_world(spec))
        err = np.linalg.norm(uv_det - uv_gt, axis=-1)
        assert err.max() < 1.0, (spec.marker_id, uv_det, uv_gt)  # subpixel refinement


def test_detect_tilted_view():
    world, img, Rcw, tcw = _render_frontal(distance=1.5, yaw=0.2, pitch=0.12)
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=32,
                                  min_area=60.0)
    found = {int(i) for i in np.asarray(det.ids) if i >= 0}
    assert len(found & {3, 17, 42, 99}) >= 3, found


def test_detection_to_ippe_pose():
    # full front-end chain: render -> detect -> IPPE -> compare with truth
    world, img, Rcw, tcw = _render_frontal(distance=1.3, yaw=0.15, pitch=0.1)
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=32,
                                  min_area=60.0)
    ids = np.asarray(det.ids)
    corners = np.asarray(det.corners)
    checked = 0
    for spec in world.markers:
        k = np.nonzero(ids == spec.marker_id)[0]
        if len(k) != 1:
            continue
        uv = corners[k[0]]
        xn = (uv - np.asarray([CAM.cx, CAM.cy])) / np.asarray([CAM.fx, CAM.fy])
        res = ippe.ippe_square(spec.size, jnp.asarray(xn[None], dtype=jnp.float32))
        # ground-truth marker->camera transform
        Rwm, twm = world.marker_pose_world(spec)
        R_cm = Rcw @ Rwm
        t_cm = Rcw @ twm + tcw
        R_est = np.asarray(res.R[0, 0])
        t_est = np.asarray(res.t[0, 0])
        ang = np.degrees(
            np.arccos(np.clip((np.trace(R_est @ R_cm.T) - 1) / 2, -1, 1))
        )
        # integer-pixel corners (no subpixel refinement yet) give a few deg
        assert ang < 8.0, (spec.marker_id, ang)
        assert np.linalg.norm(t_est - t_cm) < 0.06, (spec.marker_id, t_est, t_cm)
        checked += 1
    assert checked >= 3


def test_native_quadfind_parity():
    """The C++ contour quad proposer must find the same markers as the
    TPU label-propagation path when its quads feed the same decode stage."""
    from orb_slam2_aruco_tpu.ops.aruco import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    world, img, Rcw, tcw = _render_frontal()
    quads = native.find_quads_native(img, min_area=300.0)
    assert len(quads) >= 4
    # feed the native quads through the shared decode stage
    K = 32
    qpad = np.zeros((K, 4, 2), np.float32)
    qpad[: len(quads)] = quads[:K]
    valid = np.zeros(K, bool)
    valid[: len(quads)] = True
    det = detector.decode_quads(
        jnp.asarray(img), jnp.asarray(qpad), jnp.asarray(valid), "ARUCO"
    )
    found = {int(i) for i in np.asarray(det.ids) if i >= 0}
    assert found == {3, 17, 42, 99}, found


def test_detect_downsampled():
    """Half-resolution quad proposal must find the same markers with
    near-identical (refined) corners."""
    world, img, Rcw, tcw = _render_frontal()
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=32,
                                  min_area=80.0, downsample=2)
    found = {int(i) for i in np.asarray(det.ids) if i >= 0}
    assert found == {3, 17, 42, 99}, found
    ids = np.asarray(det.ids)
    corners = np.asarray(det.corners)
    for spec in world.markers:
        k = np.nonzero(ids == spec.marker_id)[0]
        uv_gt = _project(CAM, Rcw, tcw, world.marker_corners_world(spec))
        err = np.linalg.norm(corners[k[0]] - uv_gt, axis=-1)
        assert err.max() < 1.2, (spec.marker_id, err)


def test_classic_aruco_matches_opencv_original():
    """The algorithmically derived classic ARUCO table must be bit-identical
    to OpenCV's DICT_ARUCO_ORIGINAL (independent public implementation of the
    same published (5,2)-code scheme)."""
    cv2 = pytest.importorskip("cv2")
    ar = cv2.aruco
    ours = dictionary.get_dictionary("ARUCO").codes
    d = ar.getPredefinedDictionary(ar.DICT_ARUCO_ORIGINAL)
    for i in (0, 1, 7, 100, 512, 1023):
        img = ar.generateImageMarker(d, i, 8 * 7)
        cells = img[8:-8, 8:-8].reshape(5, 8, 5, 8).mean(axis=(1, 3)) > 127
        assert (ours[i] == cells.reshape(-1).astype(np.uint8)).all(), i


def test_mip36h12_true_table_decodes_opencv_render():
    """Markers rendered by OpenCV's INDEPENDENT renderer from the true
    ARUCO_MIP_36h12 table must decode to the right ids through our full
    detector (VERDICT item 3: real MIP footage decodability)."""
    cv2 = pytest.importorskip("cv2")
    ar = cv2.aruco
    d = dictionary.get_dictionary("ARUCO_MIP_36h12")
    assert d.num_ids == 250 and d.grid == 6 and d.max_correction == 5
    cvd = ar.getPredefinedDictionary(ar.DICT_ARUCO_MIP_36H12)
    for mid, rot in [(3, 0), (77, 1), (249, 3)]:
        cell = 12
        m = ar.generateImageMarker(cvd, mid, cell * 8)   # 8 cells incl border
        m = np.rot90(m, rot)
        img = np.full((240, 320), 200.0, np.float32)
        img[60:60 + cell * 8, 100:100 + cell * 8] = m
        det = detector.detect_markers(
            jnp.asarray(img), "ARUCO_MIP_36h12", max_quads=16,
            min_area=100.0, refine=False,
        )
        ids = np.asarray(det.ids)[np.asarray(det.valid)]
        assert mid in ids.tolist(), (mid, rot, ids)


def test_mip36h12_tau_error_correction():
    """tau-based error correction (reference dictionary.h:53-140): up to
    max_correction bit errors still decode; more must not."""
    d = dictionary.get_dictionary("ARUCO_MIP_36h12")
    rng = np.random.default_rng(5)
    code = d.codes[42].astype(np.float32)
    flip = rng.permutation(36)[: d.max_correction]
    noisy = code.copy()
    noisy[flip] = 1 - noisy[flip]
    ids, rots, dist = dictionary.decode_bits(jnp.asarray(noisy[None]),
                                             "ARUCO_MIP_36h12")
    assert int(ids[0]) == 42 and float(dist[0]) <= d.max_correction


def test_mip25h7_properties_and_tau_correction():
    """ARUCO_MIP_25h7 (the published upstream table, packed by
    tools/extract_aruco_mip_25h7.py): 100 ids, 5x5, minimum Hamming distance
    7 over ALL rotations including self-rotations, tau-based correction of
    floor((7-1)/2)=3."""
    d = dictionary.get_dictionary("ARUCO_MIP_25h7")
    assert d.num_ids == 100 and d.grid == 5 and d.max_correction == 3
    rots = np.stack([
        [np.rot90(c.reshape(5, 5), -r).reshape(-1) for r in range(4)]
        for c in d.codes
    ])
    mind = 99
    for i in range(d.num_ids):
        for r in range(1, 4):
            mind = min(mind, int((rots[i, 0] != rots[i, r]).sum()))
        for j in range(i + 1, d.num_ids):
            for r in range(4):
                mind = min(mind, int((rots[i, 0] != rots[j, r]).sum()))
    assert mind >= 7, mind
    # tau correction: 3 flipped bits still decode; the distance reports it
    rng = np.random.default_rng(9)
    code = d.codes[57].astype(np.float32)
    noisy = code.copy()
    flip = rng.permutation(25)[:3]
    noisy[flip] = 1 - noisy[flip]
    ids, rots_, dist = dictionary.decode_bits(jnp.asarray(noisy[None]),
                                              "ARUCO_MIP_25h7")
    assert int(ids[0]) == 57 and float(dist[0]) == 3.0


def test_mip25h7_decodes_opencv_rendered_markers():
    """25h7 markers rendered by OpenCV's INDEPENDENT renderer (a custom
    cv2.aruco.Dictionary built from our code table) must decode to the right
    ids through the full detector, at all rotations (VERDICT round-2 item 2:
    the samsung7 dictionary must be decodable end-to-end)."""
    cv2 = pytest.importorskip("cv2")
    ar = cv2.aruco
    d = dictionary.get_dictionary("ARUCO_MIP_25h7")
    bits = np.stack([c.reshape(5, 5) for c in d.codes])
    byte_list = np.stack([
        ar.Dictionary.getByteListFromBits(b)[0] for b in bits
    ])
    cvd = ar.Dictionary(byte_list, 5)
    for mid, rot in [(0, 0), (31, 1), (57, 2), (99, 3)]:
        cell = 12
        m = ar.generateImageMarker(cvd, mid, cell * 7)   # 7 cells incl border
        m = np.rot90(m, rot)
        img = np.full((240, 320), 200.0, np.float32)
        img[60:60 + cell * 7, 100:100 + cell * 7] = m
        det = detector.detect_markers(
            jnp.asarray(img), "ARUCO_MIP_25h7", max_quads=16,
            min_area=100.0, refine=False,
        )
        ids = np.asarray(det.ids)[np.asarray(det.valid)]
        assert mid in ids.tolist(), (mid, rot, ids)


def test_detect_close_marker_large_extent():
    """A close marker whose sample extent exceeds the former fixed 3 mip
    levels (~496 px at crop=128) must still warp/decode correctly:
    sample_batched_mxu now builds enough pooled levels to cover the whole
    image instead of silently clamping coordinates into the 128 px window
    (round-4 advisor finding, detector.py sample_batched_mxu)."""
    cam = CameraConfig(
        fx=500.0, fy=500.0, cx=480.0, cy=270.0, dist=(0, 0, 0, 0, 0),
        width=960, height=540,
    )
    world = synthetic.build_world([42], px_per_m=1400.0, spacing=0.6,
                                  grid_cols=1)
    # close enough that the marker spans ~600+ px
    Rcw, tcw = synthetic.look_at_plane_pose((0.0, 0.0), 0.16)
    img = synthetic.render_view(world, cam, Rcw, tcw)
    det = detector.detect_markers(jnp.asarray(img), "ARUCO", max_quads=16,
                                  min_area=100.0, max_area_frac=0.9)
    valid = np.asarray(det.valid)
    ids = np.asarray(det.ids)[valid]
    assert 42 in ids.tolist(), ids
    # extent check: the detected quad really exercises the deep-mip path
    q = np.asarray(det.corners)[valid][ids.tolist().index(42)]
    ext = max(q[:, 0].max() - q[:, 0].min(), q[:, 1].max() - q[:, 1].min())
    assert ext > 500.0, ext
