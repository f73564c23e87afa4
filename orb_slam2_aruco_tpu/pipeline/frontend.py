"""Per-frame perception: ORB pyramid extraction + ArUco detection + IPPE.

Replaces Frame::Frame (reference src/Frame.cc:74-181): ORB extraction across
the 8-level pyramid, keypoint undistortion, per-frame ArUco detection with
corner undistortion and the IPPE ambiguity quality gate
(`mvbArucoGood[i] = err0/err1 < 0.7`, Frame.cc:170-174).

One jitted function produces a fixed-shape Frame; there is no feature-grid
structure — windowed search is a masked distance matrix (ops/matching.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.ippe import ippe_square
from orb_slam2_aruco_tpu.ops import fast, image, orb
from orb_slam2_aruco_tpu.ops.aruco import detector
from orb_slam2_aruco_tpu.worldmap.retrieval import bow_vector


class Frame(NamedTuple):
    """Fixed-shape per-frame data. N keypoints, A marker slots."""

    kp_uv: jnp.ndarray       # [N, 2] UNDISTORTED pixel coords (level 0)
    kp_octave: jnp.ndarray   # [N] int32 pyramid level
    kp_angle: jnp.ndarray    # [N] float32
    desc: jnp.ndarray        # [N, 8] uint32
    kp_valid: jnp.ndarray    # [N] bool
    bow: jnp.ndarray         # [W] float32
    # markers
    mk_ids: jnp.ndarray      # [A] int32 ArUco id (-1 = empty)
    mk_corners: jnp.ndarray  # [A, 4, 2] UNDISTORTED corner pixels
    mk_valid: jnp.ndarray    # [A] bool
    mk_good: jnp.ndarray     # [A] bool — IPPE ambiguity gate passed
    mk_Rcm: jnp.ndarray      # [A, 3, 3] best IPPE pose (camera <- marker)
    mk_tcm: jnp.ndarray      # [A, 3]
    mk_ippe_ratio: jnp.ndarray  # [A]
    ctrl: jnp.ndarray        # [2] f32 [n_valid_keypoints, n_good_markers] —
                             # host decisions in one device->host read


def level_quotas(n_features: int, num_levels: int, scale: float):
    """Geometric per-level feature quotas (reference ORBextractor.cc:435-446)."""
    inv = 1.0 / scale
    raw = [inv**l for l in range(num_levels)]
    s = sum(raw)
    q = [max(8, int(round(n_features * r / s))) for r in raw]
    # adjust to exact total
    q[0] += n_features - sum(q)
    return q


def scale_sigma2(num_levels: int, scale: float):
    """Per-octave inverse variance weights (g2o edges use invSigma2 per
    octave; reference Frame::mvInvLevelSigma2)."""
    return jnp.asarray([1.0 / (scale ** (2 * l)) for l in range(num_levels)],
                       dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def make_frame(img, cam: Camera, cfg: SlamConfig) -> Frame:
    """img: [H, W] grayscale 0..255, any integer/float dtype (static shape).
    Pass uint8 from the host — the cast happens on device, and the 4x smaller
    transfer matters on bandwidth-constrained links."""
    ocfg = cfg.orb
    gray = img.astype(jnp.float32)
    levels = image.build_pyramid(gray, ocfg.num_levels, ocfg.scale_factor)
    quotas = level_quotas(ocfg.num_features, ocfg.num_levels, ocfg.scale_factor)
    xs, octs, angs, descs, valids = [], [], [], [], []
    for l, (lvl_img, quota) in enumerate(zip(levels, quotas)):
        kp = fast.detect_level(
            lvl_img,
            ocfg.fast_threshold,
            ocfg.fast_min_threshold,
            cell_size=ocfg.cell_size,
            per_cell_k=8,
            max_kps=quota,
            edge_margin=ocfg.patch_radius + 1,
        )
        blurred = image.gaussian_blur(lvl_img, ocfg.blur_ksize, ocfg.blur_sigma)
        # ONE patch extraction per keypoint (the windowed gather is the
        # dominant ORB cost on TPU): the blurred patch feeds both the IC
        # angle and the descriptor. The reference computes IC_Angle on the
        # unblurred level (ORBextractor.cc:1105 computes descriptors on the
        # blurred copy only); the 2-px Gaussian shifts the intensity
        # centroid negligibly, and the engine is self-consistent end to end
        # (own vocabulary + matching), so cross-impl bit parity is not a
        # goal (ops/orb.py module docstring).
        patches = orb.extract_patches(blurred, kp.xy)
        ang = orb.angles_from_patches(patches)
        d = orb.describe_patches(patches, ang)
        scale_l = ocfg.scale_factor**l
        xs.append(kp.xy * scale_l)
        octs.append(jnp.full((quota,), l, jnp.int32))
        angs.append(ang)
        descs.append(d)
        valids.append(kp.valid)
    kp_uv_raw = jnp.concatenate(xs, axis=0)
    kp_octave = jnp.concatenate(octs, axis=0)
    kp_angle = jnp.concatenate(angs, axis=0)
    desc = jnp.concatenate(descs, axis=0)
    kp_valid = jnp.concatenate(valids, axis=0)
    kp_uv = cam_mod.undistort_pixels(cam, kp_uv_raw)
    bow = bow_vector(desc, kp_valid, cfg.retrieval.num_words, cfg.retrieval.proto_seed)

    # --- markers ---------------------------------------------------------
    acfg = cfg.aruco
    det = detector.detect_markers(
        gray,
        acfg.dictionary,
        max_quads=acfg.max_quad_candidates,
        adaptive_win=acfg.adaptive_thresh_win,
        adaptive_c=acfg.adaptive_thresh_c,
        min_area=acfg.min_quad_side_px**2,
        cell_px=acfg.warp_cell_px,
        cc_iters=acfg.cc_iters,
        downsample=acfg.detect_downsample,
        refine=False,
        use_pallas_cc=acfg.use_pallas_cc,
    )
    # compact the top-A valid detections, then refine only the survivors
    # (the refinement gathers are the costly part)
    A = acfg.max_markers_per_frame
    score = jnp.where(det.valid, 1.0, 0.0)
    _, order = jax.lax.top_k(score, A)
    ids = det.ids[order]
    corners = detector.refine_corners_lines(
        gray, det.corners[order],
        n_samples=acfg.refine_samples, search_r=acfg.refine_radius,
        n_search=acfg.refine_search,
    )
    valid = det.valid[order]
    corners_un = cam_mod.undistort_pixels(cam, corners)
    xn = cam_mod.pixels_to_normalized(cam, corners_un)
    ippe_res = ippe_square(acfg.marker_size, xn)
    good = valid & (ippe_res.ratio < acfg.ippe_ambiguity_ratio)
    ctrl = jnp.stack([
        jnp.sum(kp_valid.astype(jnp.float32)),
        jnp.sum(good.astype(jnp.float32)),
    ])
    return Frame(
        kp_uv=kp_uv,
        kp_octave=kp_octave,
        kp_angle=kp_angle,
        desc=desc,
        kp_valid=kp_valid,
        bow=bow,
        mk_ids=jnp.where(valid, ids, -1),
        mk_corners=corners_un,
        mk_valid=valid,
        mk_good=good,
        mk_Rcm=ippe_res.R[:, 0],
        mk_tcm=ippe_res.t[:, 0],
        mk_ippe_ratio=ippe_res.ratio,
        ctrl=ctrl,
    )
