"""TPU-native ArUco marker detector.

Replaces the reference's vendored aruco::MarkerDetector (macro-obfuscated
markerdetector_impl.cpp; pipeline reproduced from the ArUco3 paper per
SURVEY.md §2.2): adaptive threshold -> contour polygons -> quad filter ->
fronto-parallel warp -> bit decode -> dictionary lookup -> pose (IPPE).

TPU reformulation — no contour following, no dynamic shapes:
  1. adaptive threshold: box filter (MXU) + compare          [H, W]
  2. connected components: iterative 3x3 label min-propagation (VPU); blob
     statistics via segment reductions keyed by root label
  3. quad corners per blob: 4 extremal-point reductions (farthest-from-
     centroid, farthest-from-that, extremes across the diagonal)
  4. top-K blob compaction by area -> fixed [K, 4, 2] quad candidates
  5. batched 4-pt homography + bilinear warp to a bit grid    [K, G, G]
  6. cell means -> border check + soft bits -> dictionary matmul decode
  7. corner canonicalization from the decoded rotation
Pose (IPPE + ambiguity gate) is applied by the caller (pipeline/frontend.py)
using geometry/ippe.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.ops.aruco.dictionary import decode_bits, get_dictionary
from orb_slam2_aruco_tpu.ops.image import box_filter
from orb_slam2_aruco_tpu.geometry.ippe import homography_4pt


class DetectedMarkers(NamedTuple):
    """Fixed-capacity per-frame marker detections."""

    corners: jnp.ndarray   # [K, 4, 2] float32 pixel coords, canonical order
    ids: jnp.ndarray       # [K] int32 (-1 invalid)
    valid: jnp.ndarray     # [K] bool
    decode_dist: jnp.ndarray  # [K] float32 Hamming distance of the decode


def adaptive_threshold(img, win: int = 15, c: float = 7.0):
    """Dark-region binarization: pixel < local mean - c."""
    mean = box_filter(img, win)
    return img < (mean - c)


def _seg_cummin_axis(lab, fg, sentinel, axis):
    """Segmented cumulative min of `lab` within foreground runs along `axis`,
    both directions. Implemented with lax.cummax over a packed key
    (run_id * OFFSET + (sentinel - lab)): a later run's key always dominates
    an earlier run's (segment isolation), and within a run the smallest label
    dominates — one cumulative op per direction instead of an
    associative_scan with tuple carries."""
    n = lab.shape[axis]
    offset = sentinel + 1
    if (n - 1) * offset + sentinel > 2**31 - 1:
        dt = jnp.int64
    else:
        dt = jnp.int32
    iota = jax.lax.broadcasted_iota(dt, lab.shape, axis)
    reset = ~fg
    out = lab
    for reverse in (False, True):
        pos = (n - 1) - iota if reverse else iota
        s = jax.lax.cummax(jnp.where(reset, pos, -1), axis=axis,
                           reverse=reverse)
        packed = s * offset + (sentinel - out.astype(dt))
        y = jax.lax.cummax(packed, axis=axis, reverse=reverse)
        seg = sentinel - (y - s * offset)
        out = jnp.where(fg, seg.astype(lab.dtype), out)
    return out


def connected_components(binary, iters: int, rounds: int | None = None):
    """Min-label connected components on [H, W] bool. Returns [H, W] int32
    labels (background = H*W).

    Each round combines (a) one 8-neighbor min propagation, (b) segmented
    row+column cumulative-min sweeps (a label crosses any straight scanline
    run in ONE round), and (c) a pointer jump (`lab <- lab[lab]`, valid
    because lab[p] always names a smaller-index pixel of the same blob, so
    a region whose local-min pixel learns a better label relabels entirely
    on the next jump). Convex-ish blobs (marker quads/rings) converge in
    1-4 rounds; `iters` keeps the reference semantics "geodesic coverage"
    and maps to ceil(log2(iters)) + 1 rounds; pass `rounds` to override."""
    h, w = binary.shape
    sentinel = h * w
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    labels = jnp.where(binary, flat, sentinel)

    def prop(lab):
        p = jnp.pad(lab, 1, constant_values=sentinel)
        best = lab
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                best = jnp.minimum(best, p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w])
        return jnp.where(binary, jnp.minimum(lab, best), sentinel)

    def jump(lab):
        lf = lab.reshape(-1)
        tgt = jnp.take(lf, jnp.minimum(lf, sentinel - 1))
        return jnp.where(lf == sentinel, sentinel, tgt).reshape(h, w)

    if rounds is None:
        rounds = max(2, math.ceil(math.log2(max(2, iters))) + 1)

    def body(_, lab):
        lab = prop(lab)
        lab = _seg_cummin_axis(lab, binary, sentinel, axis=1)
        lab = _seg_cummin_axis(lab, binary, sentinel, axis=0)
        return jump(lab)

    return jax.lax.fori_loop(0, rounds, body, labels)


def _corners_from_membership(labels, root_label, valid, h, w):
    """Extremal-point corner extraction shared by the XLA and fused paths.

    labels [P] per-pixel blob label, root_label [Q] selected blob labels
    (same encoding as `labels`), valid [Q]. Returns quads [Q, 4, 2]."""
    P = h * w
    flat_idx = jnp.arange(P, dtype=jnp.int32)
    xs = (flat_idx % w).astype(jnp.float32)
    ys = (flat_idx // w).astype(jnp.float32)

    # membership matrix [Q, P] — all per-blob stats are masked reductions
    M = labels[None, :] == root_label[:, None]
    coords = jnp.stack([jnp.ones_like(xs), xs, ys], axis=-1)   # [P, 3]
    stats = jnp.dot(
        M.astype(jnp.float32), coords, preferred_element_type=jnp.float32
    )  # [Q, 3] on the MXU
    cnt = jnp.maximum(stats[:, 0], 1.0)
    cx = stats[:, 1] / cnt
    cy = stats[:, 2] / cnt

    NEG = -1e18
    BIG = jnp.int32(2**30)

    def masked_argmax(metric):
        """metric [Q, P] -> (x, y) of the per-blob maximizing pixel."""
        mx = jnp.max(jnp.where(M, metric, NEG), axis=1)
        hit = M & (metric >= mx[:, None] - 1e-3)
        idx = jnp.min(jnp.where(hit, flat_idx[None, :], BIG), axis=1)
        idx = jnp.clip(idx, 0, P - 1)
        return xs[idx], ys[idx]

    # corner 1: farthest from centroid
    d2c = (xs[None, :] - cx[:, None]) ** 2 + (ys[None, :] - cy[:, None]) ** 2
    x1, y1 = masked_argmax(d2c)
    # corner 2: farthest from corner 1
    d2c1 = (xs[None, :] - x1[:, None]) ** 2 + (ys[None, :] - y1[:, None]) ** 2
    x2, y2 = masked_argmax(d2c1)
    # corners 3/4: extremes of the signed cross product across diagonal 1-2
    crossv = (xs[None, :] - x1[:, None]) * (y2 - y1)[:, None] - (
        ys[None, :] - y1[:, None]
    ) * (x2 - x1)[:, None]
    x3, y3 = masked_argmax(crossv)
    x4, y4 = masked_argmax(-crossv)

    quads = jnp.stack(
        [
            jnp.stack([x1, y1], axis=-1),
            jnp.stack([x3, y3], axis=-1),
            jnp.stack([x2, y2], axis=-1),
            jnp.stack([x4, y4], axis=-1),
        ],
        axis=-2,
    )  # [Q, 4, 2]
    return quads


def quad_candidates_fused(binary, max_quads: int, min_area: float = 64.0,
                          max_area_frac: float = 0.25, rounds: int = 3,
                          interpret: bool | None = None):
    """Quad proposal via the fused Pallas CC+bbox kernel
    (ops/pallas_cc_fused.py): ONE kernel labels blobs and computes their
    bounding boxes in VMEM, so blob ranking needs no sort/searchsorted and
    no label-propagation dispatch loop — the stage drops from ~11 ms to
    ~1 ms/frame on a v5e chip. Blobs are ranked by bbox area (the marker
    EXTENT — for a hollow border ring this is the marker square itself,
    which ranks markers more faithfully than their dark-pixel count).

    Returns (quads [Q, 4, 2], score [Q], valid [Q]) like quad_candidates."""
    import jax as _jax

    if interpret is None:
        interpret = _jax.default_backend() != "tpu"
    h, w = binary.shape
    P = h * w
    from orb_slam2_aruco_tpu.ops.pallas_cc_fused import cc_fused

    lab2d, bb_w, bb_h, Wp = cc_fused(binary, rounds=rounds,
                                     interpret=interpret)
    own_pad = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * Wp
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    root = (lab2d == own_pad) & binary
    area_bb = (bb_w * bb_h).astype(jnp.float32)
    ok = (
        root
        & (area_bb >= min_area)
        & (area_bb <= max_area_frac * P)
        & (jnp.minimum(bb_w, bb_h) >= 3)
    )
    score = jnp.where(ok, area_bb, 0.0).reshape(-1)
    vals, pos = jax.lax.top_k(score, max_quads)
    valid = vals > 0
    root_label = jnp.where(valid, lab2d.reshape(-1)[pos], -1)
    quads = _corners_from_membership(
        lab2d.reshape(-1), root_label, valid, h, w
    )
    return quads, vals, valid


def quad_candidates(binary, max_quads: int, min_area: float = 64.0,
                    max_area_frac: float = 0.25, cc_iters: int = 0,
                    use_pallas_cc: bool = False):
    """Extract up to max_quads quadrilateral blob candidates.

    Returns (quads [K, 4, 2] in (x, y) float pixels, area [K], valid [K]).
    Corner order: (c1, c3, c2, c4) = a consistent winding around the blob.

    SCATTER-FREE by design: XLA scatters on TPU serialize (a 0.5M-element
    segment_sum costs seconds), so blob statistics are computed with
    sort + searchsorted (per-pixel blob areas), top-K root compaction, and
    [Q, P] masked matmul/reductions on the MXU/VPU — milliseconds instead.
    """
    h, w = binary.shape
    P = h * w
    cc_rounds = None
    if cc_iters <= 0:
        # marker blobs (quads/border rings) converge in <= 4 scan-sweep
        # rounds; a pathological blob that needs more merely splits into
        # several candidates, which the decode stage rejects
        cc_rounds = 4
        cc_iters = h + w
    if use_pallas_cc:
        from orb_slam2_aruco_tpu.ops.pallas_cc import cc_propagate_pallas

        flat0 = (
            jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        )
        labels0 = jnp.where(binary, flat0, h * w)
        k_steps = 16
        sentinel = h * w
        # alternate a 16-step VMEM-local sweep with a pointer jump: coverage
        # ~ k_steps * 2^rounds geodesic pixels
        rounds = max(2, math.ceil(math.log2(max(2.0, cc_iters / k_steps))) + 1)

        def pallas_round(_, lab):
            lab = cc_propagate_pallas(lab, passes=1, k_steps=k_steps, tile=128)
            lf = lab.reshape(-1)
            tgt = jnp.take(lf, jnp.minimum(lf, sentinel - 1))
            return jnp.where(lf == sentinel, sentinel, tgt).reshape(h, w)

        labels2d = jax.lax.fori_loop(0, rounds, pallas_round, labels0)
    else:
        labels2d = connected_components(binary, iters=cc_iters,
                                        rounds=cc_rounds)
    labels = labels2d.reshape(-1)
    flat_idx = jnp.arange(P, dtype=jnp.int32)
    xs = (flat_idx % w).astype(jnp.float32)
    ys = (flat_idx // w).astype(jnp.float32)

    # Blob areas from a SUBSAMPLED label field: sorting the full image costs
    # tens of ms on TPU; a stride-s sample estimates each area to within
    # s^2-pixel resolution, which is plenty for the min/max-area gates and
    # the top-K ranking (marker blobs are hundreds of pixels). Label VALUES
    # are root flat-indices, so the root need not land on the sample grid.
    astride = max(1, int(round(math.sqrt(P / 32768.0)))) if P > 40000 else 1
    sub = labels2d[::astride, ::astride].reshape(-1)
    Ps = sub.shape[0]
    ss = jnp.sort(sub)
    left = jnp.searchsorted(ss, ss, side="left")
    right = jnp.searchsorted(ss, ss, side="right")
    area_run = (right - left).astype(jnp.float32) * float(astride * astride)
    run_start = left == jnp.arange(Ps, dtype=left.dtype)
    fg_run = ss < P
    area_ok = (area_run >= min_area) & (area_run <= max_area_frac * P)
    score = jnp.where(run_start & fg_run & area_ok, area_run, 0.0)
    vals, pos = jax.lax.top_k(score, max_quads)     # [Q] run-start positions
    valid = vals > 0
    root_label = jnp.where(valid, ss[pos], -1)
    quads = _corners_from_membership(labels, root_label, valid, h, w)
    return quads, vals, valid


def _quad_sample_points(quads, grid_cells: int, cell_px: int):
    """Full-res sample coordinates of the fronto-parallel warp grid:
    [K, S*S] x/y for an SxS grid over each quad (S = grid_cells*cell_px)."""
    K = quads.shape[0]
    S = grid_cells * cell_px
    src = jnp.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]], dtype=jnp.float32
    )
    src = jnp.broadcast_to(src, (K, 4, 2))
    H = homography_4pt(src, quads)  # unit square -> image
    u = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    grid = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1).reshape(-1, 3)
    pts = jnp.einsum("kij,nj->kni", H, grid)
    zs = jnp.where(jnp.abs(pts[..., 2]) < 1e-9, 1e-9, pts[..., 2])
    return pts[..., 0] / zs, pts[..., 1] / zs


def _pool2(img):
    h, w = img.shape
    return img[: (h // 2) * 2, : (w // 2) * 2].reshape(
        h // 2, 2, w // 2, 2
    ).mean(axis=(1, 3))


def sample_batched_mxu(img, px, py, crop: int = 128):
    """Batched bilinear sampling of per-batch-element LOCALIZED point sets,
    TPU-style: per element, dynamic-slice a [crop, crop] window (from a
    full / half / quarter mip level chosen by the points' extent) and
    evaluate all its samples as two banded matmuls
        samp = ((Wy @ window) * Wx).sum(-1),
    where Wy/Wx hold each sample's two bilinear row/column taps. Scattered
    per-pixel gathers — XLA:TPU executes them near one element per cycle,
    which made the warp/refine stages the detector's cost — become MXU work
    plus one windowed gather per element. Elements larger than the crop at
    full resolution automatically sample the pooled levels (mip-style area
    sampling, which if anything HELPS bit decoding).

    img: [H, W]; px, py: [K, P] full-res coords -> [K, P] samples."""
    K, P = px.shape
    # enough pooled levels that the COARSEST covers a quad spanning the whole
    # image: (crop-4) * 2^(n-1) >= max(H, W) + pad. With the former fixed 3
    # levels, a close marker filling a 960x540 frame (extent > 496 px)
    # silently clamped its sample coords into the window and decoded garbage.
    need = float(max(img.shape)) + 8.0
    n_levels = 1
    while (crop - 4.0) * (2.0 ** (n_levels - 1)) < need:
        n_levels += 1
    levels = [img]
    for _ in range(n_levels - 1):
        levels.append(_pool2(levels[-1]))
    mn_x = jnp.min(px, axis=1)
    mx_x = jnp.max(px, axis=1)
    mn_y = jnp.min(py, axis=1)
    mx_y = jnp.max(py, axis=1)
    ext = jnp.maximum(mx_x - mn_x, mx_y - mn_y) + 8.0
    lvl = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(ext / (crop - 4.0), 1e-6))),
        0, n_levels - 1,
    ).astype(jnp.int32)                                       # [K]
    scale = jnp.exp2(lvl.astype(jnp.float32))                 # [K]
    ox = jnp.floor((mn_x - 4.0) / scale)
    oy = jnp.floor((mn_y - 4.0) / scale)

    def win(level, oxl, oyl):
        h, w = level.shape
        oxi = jnp.clip(oxl.astype(jnp.int32), 0, max(w - crop, 0))
        oyi = jnp.clip(oyl.astype(jnp.int32), 0, max(h - crop, 0))
        sl = jax.vmap(
            lambda oy_, ox_: jax.lax.dynamic_slice(
                level, (oy_, ox_), (min(crop, h), min(crop, w))
            )
        )(oyi, oxi)
        if sl.shape[1:] != (crop, crop):
            sl = jnp.pad(sl, ((0, 0), (0, crop - sl.shape[1]),
                              (0, crop - sl.shape[2])))
        return sl, oxi, oyi

    wins = [win(lv, ox, oy) for lv in levels]
    window, oxi, oyi = wins[-1]                                # coarsest
    for li in range(n_levels - 2, -1, -1):
        wl, oxl, oyl = wins[li]
        sel = lvl == li
        window = jnp.where(sel[:, None, None], wl, window)     # [K, C, C]
        oxi = jnp.where(sel, oxl, oxi)
        oyi = jnp.where(sel, oyl, oyi)
    # local coords at the chosen level (pooled level pixel centers sit at
    # full-res coords scale*(i+0.5)-0.5)
    lx = jnp.clip((px + 0.5) / scale[:, None] - 0.5 - oxi[:, None],
                  0.0, crop - 1.0)
    ly = jnp.clip((py + 0.5) / scale[:, None] - 0.5 - oyi[:, None],
                  0.0, crop - 1.0)
    iota = jnp.arange(crop, dtype=jnp.float32)
    Wy = jnp.maximum(0.0, 1.0 - jnp.abs(ly[..., None] - iota))  # [K, P, C]
    Wx = jnp.maximum(0.0, 1.0 - jnp.abs(lx[..., None] - iota))
    rows = jnp.einsum(
        "kpc,kcd->kpd", Wy, window, preferred_element_type=jnp.float32
    )
    return jnp.sum(rows * Wx, axis=-1)                         # [K, P]


def warp_quads(img, quads, grid_cells: int, cell_px: int):
    """Fronto-parallel warp of each quad to a [G*cell_px]^2 patch.
    quads [K, 4, 2] are the OUTER border corners; the unit square maps to the
    full marker including border. Returns [K, S, S] samples (windowed-matmul
    bilinear — see sample_batched_mxu)."""
    K = quads.shape[0]
    S = grid_cells * cell_px
    px, py = _quad_sample_points(quads, grid_cells, cell_px)
    samp = sample_batched_mxu(img, px, py)
    return samp.reshape(K, S, S)


def decode_quads(img, quads, qvalid, dict_name: str, border_cells: int = 1,
                 cell_px: int = 8):
    """Warp + bit extraction + dictionary lookup + corner canonicalization."""
    d = get_dictionary(dict_name)
    G = d.grid + 2 * border_cells
    S = G * cell_px
    warped = warp_quads(img, quads, G, cell_px)  # [K, S, S]
    K = quads.shape[0]
    cells = warped.reshape(K, G, cell_px, G, cell_px).mean(axis=(2, 4))  # [K, G, G]
    # per-quad normalization: mid threshold between min and max cell
    lo = cells.min(axis=(1, 2), keepdims=True)
    hi = cells.max(axis=(1, 2), keepdims=True)
    norm = (cells - lo) / jnp.maximum(hi - lo, 1e-6)
    bits_grid = norm  # soft bits in [0, 1], 1 = white
    # border must be black
    border_mask = jnp.zeros((G, G), dtype=bool)
    border_mask = border_mask.at[:border_cells, :].set(True)
    border_mask = border_mask.at[-border_cells:, :].set(True)
    border_mask = border_mask.at[:, :border_cells].set(True)
    border_mask = border_mask.at[:, -border_cells:].set(True)
    border_score = jnp.sum(
        jnp.where(border_mask[None], bits_grid, 0.0), axis=(1, 2)
    ) / jnp.sum(border_mask)
    border_ok = border_score < 0.35

    inner = bits_grid[:, border_cells:-border_cells, border_cells:-border_cells]
    inner_hard = (inner > 0.5).astype(jnp.float32).reshape(K, d.nbits)
    ids, rots, dist = decode_bits(inner_hard, dict_name)
    ok = qvalid & border_ok & (dist <= d.max_correction)

    # canonicalize corners: observed grid = rot90(canonical, -rot) means the
    # canonical top-left corner is `rot` steps around the observed quad
    idx = (jnp.arange(4)[None, :] + rots[:, None]) % 4
    corners = jnp.take_along_axis(quads, idx[..., None], axis=1)
    return DetectedMarkers(
        corners=corners,
        ids=jnp.where(ok, ids, -1),
        valid=ok,
        decode_dist=dist,
    )


def detect_markers(
    img,
    dict_name: str,
    max_quads: int = 64,
    adaptive_win: int = 15,
    adaptive_c: float = 7.0,
    min_area: float = 100.0,
    max_area_frac: float = 0.25,
    cell_px: int = 8,
    cc_iters: int = 0,
    downsample: int = 1,
    refine: bool = True,
    use_pallas_cc: bool = False,
) -> DetectedMarkers:
    """Full detection pipeline on a grayscale image [H, W] float32 (0..255).

    `downsample` > 1 runs the blob/quad proposal stage at reduced resolution
    (the ArUco3 paper's low-resolution detection idea): connected components,
    sorting, and blob statistics shrink by downsample^2 while bit decoding
    and subpixel corner refinement still sample the FULL-resolution image, so
    accuracy is preserved.

    Cite: reference Frame.cc:142 calls MarkerDetector::detect per frame; this
    is the jittable equivalent with static output capacity."""
    binary = adaptive_threshold(img, adaptive_win, adaptive_c)
    if downsample > 1:
        ds = downsample
        h0, w0 = binary.shape
        hq = (h0 // ds) * ds
        wq = (w0 // ds) * ds
        # a low-res pixel is foreground if most of its block is (majority
        # vote keeps thin borders from vanishing at ds=2)
        blocks = binary[:hq, :wq].reshape(h0 // ds, ds, w0 // ds, ds)
        binary_s = blocks.sum(axis=(1, 3)) * 2 >= ds * ds
        if use_pallas_cc:
            quads, _, qvalid = quad_candidates_fused(
                binary_s, max_quads, min_area=min_area / (ds * ds),
                max_area_frac=max_area_frac,
            )
        else:
            quads, _, qvalid = quad_candidates(
                binary_s, max_quads, min_area=min_area / (ds * ds),
                max_area_frac=max_area_frac, cc_iters=cc_iters,
            )
        quads = quads * float(ds) + (ds - 1) / 2.0
    else:
        if use_pallas_cc:
            quads, _, qvalid = quad_candidates_fused(
                binary, max_quads, min_area=min_area,
                max_area_frac=max_area_frac,
            )
        else:
            quads, _, qvalid = quad_candidates(
                binary, max_quads, min_area=min_area,
                max_area_frac=max_area_frac, cc_iters=cc_iters,
            )
    # reject border-touching quads: a partially visible marker can decode to
    # a DIFFERENT valid code (the reference detector likewise drops contours
    # touching the image border)
    h, w = img.shape
    margin = 3.0
    inside = (
        (quads[..., 0] >= margin) & (quads[..., 0] <= w - 1 - margin)
        & (quads[..., 1] >= margin) & (quads[..., 1] <= h - 1 - margin)
    ).all(axis=-1)
    qvalid = qvalid & inside
    det = decode_quads(img, quads, qvalid, dict_name, cell_px=cell_px)
    if refine:
        # subpixel corner refinement (CORNER_LINES mode) of the DECODED
        # survivors only: at most a handful of the max_quads candidates
        # carry a valid dictionary id, and the full-res line sampling is
        # ~1.9 ms/frame when run over all 64 candidate slots — compact to a
        # 16-slot budget, refine, scatter back
        Kq = det.corners.shape[0]
        R = min(16, Kq)
        _, ridx = jax.lax.top_k(det.valid.astype(jnp.int32), R)
        refined_sub = refine_corners_lines(img, det.corners[ridx])
        keep = det.valid[ridx]
        corners = det.corners.at[ridx].set(
            jnp.where(keep[:, None, None], refined_sub, det.corners[ridx])
        )
        det = det._replace(corners=corners)
    # deduplicate: if two candidate blobs decode to the same id (border blob
    # and interior blob can both form quads), keep the first occurrence
    ids = det.ids
    K = ids.shape[0]
    same = (ids[:, None] == ids[None, :]) & (ids[:, None] >= 0)
    earlier = jnp.tril(jnp.ones((K, K), dtype=bool), -1)
    dup = jnp.any(same & earlier, axis=1)
    ok = det.valid & ~dup
    return det._replace(valid=ok, ids=jnp.where(ok, ids, -1))


def refine_corners_lines(img, corners, n_samples: int = 16, search_r: float = 2.5,
                         n_search: int = 11):
    """Subpixel corner refinement by border-line fitting (the reference's
    CORNER_LINES mode, Thirdparty/aruco markerdetector.h corner refinement
    options): for each quad side, sample points along the side, find the
    subpixel intensity-gradient maximum along the side's normal (parabolic
    fit), total-least-squares fit a line per side, and intersect adjacent
    lines. Fully batched over markers x sides x samples.

    corners: [K, 4, 2] -> refined [K, 4, 2].
    """
    K = corners.shape[0]
    p0 = corners                                   # side i: corner i -> i+1
    p1 = jnp.roll(corners, -1, axis=1)
    # sample fractions away from the corners (corners themselves are noisy)
    fr = (jnp.arange(n_samples, dtype=jnp.float32) + 1.0) / (n_samples + 1.0)
    pts = p0[:, :, None, :] + fr[None, None, :, None] * (
        p1 - p0
    )[:, :, None, :]                               # [K, 4, S, 2]
    d = p1 - p0
    length = jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    tang = d / length
    normal = jnp.stack([-tang[..., 1], tang[..., 0]], axis=-1)  # [K, 4, 2]
    # offsets along the normal
    offs = jnp.linspace(-search_r, search_r, n_search)
    samp_xy = (
        pts[:, :, :, None, :]
        + offs[None, None, None, :, None] * normal[:, :, None, None, :]
    )  # [K, 4, S, n_search, 2]
    flatxy = samp_xy.reshape(K, -1, 2)
    vals = sample_batched_mxu(img, flatxy[..., 0], flatxy[..., 1]).reshape(
        K, 4, n_samples, n_search
    )
    # gradient magnitude along the normal (central differences over offsets)
    g = jnp.abs(vals[..., 2:] - vals[..., :-2])    # [K, 4, S, n_search-2]
    gi = jnp.argmax(g, axis=-1)
    # parabolic subpixel peak around the argmax
    gim = jnp.clip(gi, 1, n_search - 4)
    gm1 = jnp.take_along_axis(g, gim[..., None] - 1, axis=-1)[..., 0]
    g0 = jnp.take_along_axis(g, gim[..., None], axis=-1)[..., 0]
    gp1 = jnp.take_along_axis(g, gim[..., None] + 1, axis=-1)[..., 0]
    denom = gm1 - 2 * g0 + gp1
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (gm1 - gp1) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    step = offs[1] - offs[0]
    off_best = offs[0] + (gim.astype(jnp.float32) + 1.0 + delta) * step
    edge_pts = pts + off_best[..., None] * normal[:, :, None, :]  # [K, 4, S, 2]
    # total least squares line per side: centroid + principal direction
    mu = jnp.mean(edge_pts, axis=2, keepdims=True)
    dc = edge_pts - mu
    C = jnp.einsum("kfsi,kfsj->kfij", dc, dc)
    evals, evecs = jnp.linalg.eigh(C)
    dirv = evecs[..., :, 1]                        # principal direction [K,4,2]
    mu = mu[:, :, 0, :]
    # intersect line i-1 with line i to refine corner i
    p_a = jnp.roll(mu, 1, axis=1)
    d_a = jnp.roll(dirv, 1, axis=1)
    p_b = mu
    d_b = dirv
    # solve p_a + t d_a = p_b + s d_b
    cross = d_a[..., 0] * d_b[..., 1] - d_a[..., 1] * d_b[..., 0]
    diff = p_b - p_a
    t = (diff[..., 0] * d_b[..., 1] - diff[..., 1] * d_b[..., 0]) / jnp.where(
        jnp.abs(cross) < 1e-9, 1e-9, cross
    )
    refined = p_a + t[..., None] * d_a
    # reject wild refinements (> 3 px from the integer estimate)
    ok = jnp.linalg.norm(refined - corners, axis=-1) < 3.0
    return jnp.where(ok[..., None], refined, corners)
