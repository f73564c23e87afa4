"""Monocular bootstrap.

Replaces Tracking::MonocularInitialization + Initializer (reference
src/Tracking.cc:494-688, src/Initializer.cc):

  * marker path (primary): the relative pose between the two init frames is
    taken from the best common good marker, T21 = T2m * Tm1, scored by corner
    reprojection over all common markers (Tracking.cc:549-629); scale is
    metric from the known marker side, so no later scale correction is
    needed (state.scale_done).
  * classic path (H ∥ F RANSAC) exists in geometry/twoview.py and is wired
    for marker-free sequences via `classic_relative_pose`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry import twoview
from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.geometry.lie import se3_compose, se3_inverse
from orb_slam2_aruco_tpu.ops import matching
from orb_slam2_aruco_tpu.pipeline.frontend import Frame


class InitCandidate(NamedTuple):
    ok: jnp.ndarray         # bool
    R21: jnp.ndarray        # [3, 3]
    t21: jnp.ndarray        # [3]
    err: jnp.ndarray        # mean corner reprojection error (px)
    baseline: jnp.ndarray   # ||t21||

    @property
    def ctrl(self):
        # [ok, err, baseline] for a single host readback
        import jax.numpy as _jnp

        return _jnp.stack([
            self.ok.astype(_jnp.float32), self.err, self.baseline
        ])


@functools.partial(jax.jit, static_argnames=("cfg",))
def marker_relative_pose(f1: Frame, f2: Frame, cam: Camera,
                         cfg: SlamConfig) -> InitCandidate:
    """Best relative pose T21 from common good markers."""
    A = f1.mk_ids.shape[0]
    # pair markers by id
    eq = (f1.mk_ids[:, None] == f2.mk_ids[None, :]) & (f1.mk_ids[:, None] >= 0)
    eq = eq & (f1.mk_good & f1.mk_valid)[:, None] & (f2.mk_good & f2.mk_valid)[None, :]
    pair2 = jnp.argmax(eq.astype(jnp.int32), axis=1)   # [A] idx into f2
    paired = jnp.any(eq, axis=1)
    p2 = jnp.maximum(pair2, 0)

    # candidate poses: T21 = T2m(a2) * inverse(T1m(a1))
    Rm1, tm1 = se3_inverse(f1.mk_Rcm, f1.mk_tcm)
    R21 = jnp.einsum("aij,ajk->aik", f2.mk_Rcm[p2], Rm1)
    t21 = jnp.einsum("aij,aj->ai", f2.mk_Rcm[p2], tm1) + f2.mk_tcm[p2]

    # score each candidate by reprojection of ALL paired markers' corners in
    # frame 2: predicted corner = T21 * (T1m(b) * corner_local(b))
    from orb_slam2_aruco_tpu.geometry.ippe import square_object_points

    corners_local = square_object_points(cfg.aruco.marker_size)  # [4, 3]
    c1 = (
        jnp.einsum("bij,nj->bni", f1.mk_Rcm, corners_local)
        + f1.mk_tcm[:, None, :]
    )  # [A, 4, 3] corners in frame-1 camera coords

    def score(R, t):
        pc2 = jnp.einsum("ij,bnj->bni", R, c1) + t
        uv = cam_mod.project(cam, pc2)
        obs = f2.mk_corners[p2]
        err = jnp.linalg.norm(uv - obs, axis=-1)          # [A, 4]
        err = jnp.where(pc2[..., 2] > 0.02, err, 1e6)
        w = paired.astype(jnp.float32)[:, None]
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * 4, 1.0)

    errs = jax.vmap(score)(R21, t21)
    errs = jnp.where(paired, errs, 1e9)
    best = jnp.argmin(errs)
    baseline = jnp.linalg.norm(t21[best])
    ok = (
        (errs[best] < cfg.tracking.init_marker_reproj_err)
        & (baseline >= cfg.tracking.init_min_marker_baseline)
    )
    return InitCandidate(
        ok=ok, R21=R21[best], t21=t21[best], err=errs[best], baseline=baseline
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def classic_relative_pose(f1: Frame, f2: Frame, cam: Camera,
                          cfg: SlamConfig) -> InitCandidate:
    """Markerless H ∥ F bootstrap (reference Initializer::Initialize).
    Matches the two frames, fits H and F on batched hypothesis sets, picks
    the model by RH > 0.40, decomposes, and selects the (R, t) candidate
    passing the most CheckRT gates. Translation scale is arbitrary (unit)."""
    d = matching.distance_matrix(f1.desc, f2.desc, f1.kp_valid, f2.kp_valid)
    wm = matching.window_mask(f1.kp_uv, f2.kp_uv, 100.0)
    d = jnp.where(wm, d, matching.INF)
    m = matching.nn_match(d, max_dist=float(cfg.matcher.th_low), nn_ratio=0.9,
                          mutual=True)
    uv1 = f1.kp_uv
    uv2 = f2.kp_uv[jnp.maximum(m.idx, 0)]
    mask = m.valid.astype(jnp.float32)
    xn1 = cam_mod.pixels_to_normalized(cam, uv1)
    xn2 = cam_mod.pixels_to_normalized(cam, uv2)

    # batched RANSAC: S hypothesis sets of 8 matches
    S = 128
    key = jax.random.PRNGKey(0)
    n = uv1.shape[0]
    p = mask / jnp.maximum(jnp.sum(mask), 1.0)
    sets = jax.random.choice(key, n, shape=(S, 8), replace=True, p=p)
    F = twoview.fundamental_8pt(uv1[sets], uv2[sets])
    sf, _ = twoview.score_fundamental(
        F, jnp.broadcast_to(uv1, (S, n, 2)), jnp.broadcast_to(uv2, (S, n, 2)),
        jnp.broadcast_to(mask, (S, n)),
    )
    bestF = F[jnp.argmax(sf)]
    H = twoview.homography_dlt(uv1[sets[:, :4]], uv2[sets[:, :4]])
    sh, _ = twoview.score_homography(
        H, jnp.broadcast_to(uv1, (S, n, 2)), jnp.broadcast_to(uv2, (S, n, 2)),
        jnp.broadcast_to(mask, (S, n)),
    )
    bestH = H[jnp.argmax(sh)]
    RH = jnp.max(sh) / jnp.maximum(jnp.max(sh) + jnp.max(sf), 1e-9)

    K = cam.K
    E = twoview.essential_from_fundamental(bestF, K)
    Re, te = twoview.decompose_E(E)
    Rh, th = twoview.decompose_H(bestH, K)
    Rs = jnp.concatenate([Re, Rh], axis=0)   # [12, 3, 3]
    ts = jnp.concatenate([te, th], axis=0)
    use_h = RH > 0.40
    cand_mask = jnp.concatenate(
        [jnp.full((4,), ~use_h), jnp.full((8,), use_h)]
    )
    n_good, _, _, _ = twoview.check_rt(
        Rs, ts,
        jnp.broadcast_to(xn1, (12, n, 2)), jnp.broadcast_to(xn2, (12, n, 2)),
        jnp.broadcast_to(mask, (12, n)),
    )
    n_good = jnp.where(cand_mask, n_good, -1)
    b = jnp.argmax(n_good)
    total = jnp.sum(mask)
    ok = (n_good[b] > 0.7 * total) & (total >= cfg.tracking.min_init_matches)
    return InitCandidate(
        ok=ok, R21=Rs[b], t21=ts[b],
        err=jnp.float32(0.0), baseline=jnp.linalg.norm(ts[b]),
    )
