"""Single typed configuration for the whole engine.

Every hardcoded constant scattered through the reference
(e.g. marker size 0.187 vs 0.165 at reference src/Frame.cc:131 vs
src/Tracking.cc:742; ArUco edge weight 25 at src/Optimizer.cc:179; matcher
thresholds at src/ORBmatcher.cc:37-39) becomes a named field here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera with radial-tangential distortion (reference: camera yml,
    parsed in src/Tracking.cc:58-143)."""

    fx: float = 500.0
    fy: float = 500.0
    cx: float = 480.0
    cy: float = 270.0
    # k1, k2, p1, p2, k3 (OpenCV order)
    dist: Tuple[float, float, float, float, float] = (0.0, 0.0, 0.0, 0.0, 0.0)
    width: int = 960
    height: int = 540
    fps: float = 30.0


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extraction (reference: src/ORBextractor.cc)."""

    num_features: int = 1000          # mono_cvcam.cc:78 (2000 for mono_marker)
    scale_factor: float = 1.2         # 8-level pyramid, ORBextractor.cc:435
    num_levels: int = 8
    fast_threshold: float = 20.0      # initial per-cell threshold
    fast_min_threshold: float = 7.0   # fallback threshold, ORBextractor.cc:809
    cell_size: int = 32               # detection cell (reference uses 30x30, we
                                      # use 32 for TPU tile alignment)
    patch_radius: int = 15            # IC_Angle / BRIEF patch half-size 31x31
    blur_ksize: int = 7               # Gaussian blur before BRIEF
    blur_sigma: float = 2.0


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching (reference: src/ORBmatcher.cc:37-39)."""

    th_high: int = 100                # max Hamming distance (loose)
    th_low: int = 50                  # max Hamming distance (strict)
    nn_ratio_tracking: float = 0.9    # per call site in reference
    nn_ratio_init: float = 0.9
    histo_length: int = 30            # rotation-consistency histogram bins
    check_orientation: bool = True
    search_radius_motion: float = 15.0   # window for motion-model projection search
    search_radius_map: float = 5.0       # window (scaled) for local-map search


@dataclasses.dataclass(frozen=True)
class ArucoConfig:
    """ArUco marker detection + mapping (reference: Frame.cc:129-177,
    LocalMapping.cc:487-797)."""

    dictionary: str = "ARUCO"         # ARUCO | ARUCO_MIP_25h7 | ARUCO_MIP_36h12
    marker_size: float = 0.165        # metres; unified (ref had 0.187/0.165 split)
    max_markers_per_frame: int = 16   # static capacity
    max_quad_candidates: int = 64     # static capacity for quad proposals
    ippe_ambiguity_ratio: float = 0.7  # err0/err1 gate (Frame.cc:170-174)
    warp_bits_margin: int = 1         # black border cells on each side
    warp_cell_px: int = 3             # warp samples per bit-cell axis (3x3
                                      # per cell; TPU gathers are the warp's
                                      # cost, so keep this small)
    adaptive_thresh_win: int = 15     # box window for adaptive threshold
    adaptive_thresh_c: float = 7.0
    cc_iters: int = 0                 # connected-component propagation depth
                                      # (0 = auto: min(192, max(H,W)//2))
    detect_downsample: int = 1        # blob/quad proposal at 1/ds resolution
                                      # (decode + subpixel refine stay full-res)
    use_pallas_cc: bool = True        # fused Pallas CC+bbox quad proposal
                                      # (ops/pallas_cc_fused; 20.8 -> 7.9
                                      # ms/frame detect on v5e). Auto-falls
                                      # back to interpret mode off-TPU.
    min_quad_side_px: float = 10.0
    refine_samples: int = 16          # CORNER_LINES: edge points per side
    refine_search: int = 11           # ... gradient probes per edge point
    refine_radius: float = 2.5        # ... probe span (px) along the normal
                                      # (bilinear gathers are the refine
                                      # stage's cost: samples*search*4 per
                                      # marker side)
    edge_weight: float = 25.0         # info = w * I2 on corner edges (Optimizer.cc:179)
    corner_huber_delta: float = 2.4477  # sqrt(5.991)
    well_tracked_reproj_err: float = 2.0   # IsArucoWellTrack gate (Tracking.cc:1062)
    well_tracked_max_t: float = 0.3        # ||t_rel|| gate
    plane_fit_min_points: int = 5     # CreateArucoMapPoints (LocalMapping.cc:549)
    plane_angle_good_deg: float = 15.0   # normal-vs-plane promote gate
    plane_angle_bad_lo_deg: float = 40.0
    plane_angle_bad_hi_deg: float = 140.0
    max_bad_computed: int = 3         # SetBadFlag after 3 bad (LocalMapping.cc:639)
    scale_corr_max_len_diff: float = 0.015  # scale correction consistency gate
    scale_corr_min_markers: int = 3


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Tracking cascade + keyframe policy (reference: src/Tracking.cc)."""

    min_init_features: int = 100      # MonocularInitialization (Tracking.cc:500)
    min_init_matches: int = 100
    init_min_marker_baseline: float = 0.1   # ||t21|| gate (Tracking.cc:549-629)
    init_marker_reproj_err: float = 2.0     # 8-corner candidate gate (the
                                            # reference uses 0.5 with subpixel-
                                            # refined corners, Tracking.cc:624)
    init_min_good_frac: float = 0.7   # InitializeUseAruco accept (Initializer.cc:185)
    min_matches_motion: int = 20
    min_matches_refkf: int = 15
    min_inliers_track: int = 10
    min_matches_local_map: int = 30
    max_local_keyframes: int = 80     # UpdateLocalKeyFrames cap (Tracking.cc:1609)
    max_frames_between_kf: int = 30   # ~1 s at 30 fps
    min_frames_between_kf: int = 0
    kf_ref_ratio: float = 0.75        # NeedNewKeyFrame tracked/ref ratio
                                      # (Tracking.cc:1352 — the upstream mono
                                      # 0.9 override is commented out in the
                                      # reference fork)
    reloc_min_inliers: int = 50       # PoseOptimization >= 50 (Tracking.cc:1741+)
    reset_if_lost_with_kfs_leq: int = 5
    pipeline_depth: int = 0           # SLAM-mode host pipelining: dispatch
                                      # frame k+N's tracking before reading
                                      # frame k's control vector, so the
                                      # device->host readback latency overlaps
                                      # compute (the TPU-native analogue of the
                                      # reference's tracking thread not
                                      # blocking on LocalMapping). 0 = fully
                                      # synchronous host decisions (simplest
                                      # semantics); 2-3 hides a ~20 ms
                                      # round trip. Keyframe decisions and
                                      # LOST detection lag by N frames.
    loc_two_stage: bool = True        # localization chunks: run the cheap
                                      # motion-tracking cascade as the only
                                      # SEQUENTIAL part (scan) and batch the
                                      # expensive local-map matching+refine
                                      # across the whole chunk (vmap -> MXU);
                                      # frame i+1 then seeds from frame i's
                                      # stage-1 pose instead of its refined
                                      # pose (sub-pixel difference in
                                      # steady-state tracking). False = the
                                      # fully sequential reference-ordered
                                      # cascade.
    loc_seed_mode: str = "scan"       # localization-chunk stage-1 seeding:
                                      # "scan" = sequential motion-model
                                      # cascade (frame i+1 seeds from frame
                                      # i's pose — reference-ordered);
                                      # "extrapolate" = NO sequential pass:
                                      # every frame seeds from the previous
                                      # chunk's velocity extrapolation,
                                      # overridden per-frame by an absolute
                                      # marker pose candidate when one is
                                      # visible, then matches the local map
                                      # directly at a widened radius — the
                                      # whole chunk becomes two vmapped
                                      # passes. A frame whose seed was too
                                      # far off fails its inlier gate and
                                      # the stream's rewind path replays it
                                      # sequentially (results equal the
                                      # scan path whenever tracking holds).
    loc_extrap_radius_scale: float = 2.5   # widened pass-1 search radius
                                      # multiplier for extrapolate mode
    loc_extrap_passes: int = 2        # 2 = wide seed pass + standard refine
    loc_seed_marker_err: float = 10.0  # extrapolate-chunk SEED acceptance for
                                       # the absolute marker pose (px mean
                                       # corner reproj) — looser than the
                                       # 2 px IsArucoWellTrack trust gate:
                                       # a seed only needs to land inside
                                       # the widened match window
                                      # pass (matches the scan path's final
                                      # accuracy contract); 1 = the wide
                                      # pass IS the final pose — halves the
                                      # cascade for serving workloads that
                                      # tolerate the wide-window match set
    local_map_candidates: int = 4096  # static cap for the compacted local-map
                                      # point set in track_local_map; the
                                      # [C, N] window-matching passes are the
                                      # refine stage's bandwidth cost, so C
                                      # should cover the visible local map and
                                      # no more
    seed_rounds: int = 2              # trimmed LM budget (rounds x iters) for
    seed_iters: int = 6               # the two-stage chunk's stage-1 SEED pose
                                      # (full 4x10 refinement follows in
                                      # stage 2, so the seed only needs to
                                      # land within the search window)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Levenberg–Marquardt engine (replaces g2o; reference src/Optimizer.cc)."""

    pose_rounds: int = 4              # 4 rounds with chi2 inlier reclassify
                                      # between rounds (Optimizer.cc:438-511)
    pose_iters_per_round: int = 10    # LM iteration CAP per round; the loop
                                      # exits early once chi2 stops improving
                                      # (monotone LM => identical pose), so a
                                      # warm-seeded frame runs ~3-5 iterations
                                      # instead of the full 10
    chi2_mono: float = 5.991          # 2-dof 95% gate
    huber_delta: float = 2.4477       # sqrt(5.991)
    local_ba_iters_first: int = 5
    local_ba_iters_second: int = 10
    global_ba_iters: int = 20         # init GBA (Tracking.cc:795); 10 after loop
    post_loop_gba_iters: int = 20     # total LM iterations of the post-loop
                                      # global BA, drained in slices between
                                      # frames (the reference's detached GBA
                                      # thread, LoopClosing.cc:880)
    gba_slice_iters: int = 2          # GBA iterations per frame step
    local_ba_slices: int = 2          # pipelined mode: the per-insert local
                                      # BA is sliced over this many subsequent
                                      # frames (the reference never blocks
                                      # tracking on mapping — its mbAbortBA
                                      # interrupt, LocalMapping.cc:94; this is
                                      # the amortized equivalent)
    distributed_gba: bool = False     # shard post-loop GBA observations over
                                      # all visible devices (mesh psum Schur
                                      # reduction, parallel/dist_ba.py)
    sim3_iters: int = 5
    essential_graph_iters: int = 20
    essential_graph_min_covis: int = 100  # covisibility edge weight gate
    lm_lambda_init: float = 1e-4
    lm_lambda_essential: float = 1e-16  # reference OptimizeEssentialGraph
    lm_lambda_up: float = 10.0
    lm_lambda_down: float = 0.1


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Static capacities for the fixed-shape map state (SLAM's dynamic
    insert/delete becomes masked slot allocation)."""

    max_keyframes: int = 256
    max_points: int = 20000
    max_markers: int = 64
    max_obs_per_point: int = 24       # per-point observation slots
    triangulation_neighbors: int = 20  # top-N covisible KFs searched for new
                                       # points (reference top-20 for mono,
                                       # LocalMapping.cc:222-229); searched in
                                       # ONE batched pass (vmap over neighbors)
    local_ba_window: int = 8          # window cameras in local BA
    local_ba_fixed_ring: int = 8      # fixed observer-ring capacity: out-of-
                                      # window KFs observing window points
                                      # enter local BA as FIXED vertices
                                      # (Optimizer.cc:820-838)
    covis_edge_min: int = 15          # covisibility edge threshold (KeyFrame.cc:386)
    max_loop_edges: int = 16          # persistent loop-edge table capacity
                                      # (KeyFrame::AddLoopEdge, KeyFrame.cc:515)
    cull_found_ratio: float = 0.25    # MapPointCulling (LocalMapping.cc:185)
    kf_cull_redundancy: float = 0.9   # KeyFrameCulling 90% rule
    kf_cull_marker_min_obs: int = 5   # keep KF if a seen marker has <=5 obs


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Loop closing (reference: src/LoopClosing.cc)."""

    min_kfs_between_loops: int = 10
    consistency_threshold: int = 3
    sim3_min_inliers: int = 15        # aruco-seeded path (LoopClosing.cc:362-483)
    sim3_min_inliers_classic: int = 20
    proj_min_matches: int = 30
    proj_min_matches_classic: int = 40
    fix_scale: bool = True            # markers give metric scale


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """Place recognition: batched binary-descriptor scoring replaces the DBoW2
    vocabulary (reference: src/KeyFrameDatabase.cc)."""

    num_words: int = 4096             # random binary prototype count
    proto_seed: int = 7
    min_shared_word_frac: float = 0.8
    min_acc_score_frac: float = 0.75


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Multi-chip layout for distributed bundle adjustment."""

    kf_axis: str = "kf"               # keyframe-block sharding axis
    num_devices: int = 1


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    orb: OrbConfig = dataclasses.field(default_factory=OrbConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    aruco: ArucoConfig = dataclasses.field(default_factory=ArucoConfig)
    tracking: TrackingConfig = dataclasses.field(default_factory=TrackingConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    loop: LoopConfig = dataclasses.field(default_factory=LoopConfig)
    retrieval: RetrievalConfig = dataclasses.field(default_factory=RetrievalConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> SlamConfig:
    return SlamConfig()
