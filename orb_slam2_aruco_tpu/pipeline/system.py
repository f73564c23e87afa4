"""System facade: the host-side orchestration loop.

Replaces System + the Tracking state machine (reference src/System.cc,
src/Tracking.cc:192-492). The reference's 4 POSIX threads become sequential
phases of one program driven here (SURVEY.md §5): per frame —
frontend -> (init | track cascade -> local map) -> [keyframe -> mapping
phase]. Only scalars cross the device->host boundary for control flow;
all heavy work is inside jitted fixed-shape steps.

Tracking states mirror the reference (Tracking.h:86-92):
NOT_INITIALIZED -> OK -> LOST (-> relocalize by markers -> OK).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.config import SlamConfig
from orb_slam2_aruco_tpu.geometry import camera as cam_mod
from orb_slam2_aruco_tpu.geometry.lie import se3_compose, se3_inverse
from orb_slam2_aruco_tpu.pipeline import initializer, loop_closing, mapping, tracking
from orb_slam2_aruco_tpu.pipeline.frontend import Frame, make_frame
from orb_slam2_aruco_tpu.worldmap.state import MapState, empty_map


class TrackingState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class FrameRecord:
    frame_id: int
    ts: float
    Rcw: np.ndarray
    tcw: np.ndarray
    state: TrackingState


class SlamSystem:
    """Monocular SLAM engine facade (System::TrackMonocular equivalent)."""

    def __init__(self, cfg: SlamConfig):
        self.cfg = cfg
        self.cam = cam_mod.camera_from_config(cfg.camera)
        self.map = empty_map(cfg)
        self.state = TrackingState.NO_IMAGES_YET
        self.frame_id = 0
        self.n_keyframes = 0
        self.last_kf_frame_id = -(10**9)
        self.last_reloc_frame_id = -(10**9)
        self.ref_kf = 0
        self.last_kf_slot = -1
        self.prev_kf_slot = -1
        # authoritative per-keyframe-slot timestamps in float64: epoch-scale
        # stamps (the reference's stem/1e6 LoadImages convention can be epoch
        # seconds) lose ~100 s of precision in the device-side float32 kf_ts
        self.kf_ts64 = np.zeros(cfg.map.max_keyframes, np.float64)
        # last-frame context for motion-model matching
        self.last_frame: Optional[Frame] = None
        self.last_obs = None
        self.last_pose: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        self.vel: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
        # init
        self.init_frame: Optional[Frame] = None
        self.init_frame_id = -1
        # outputs
        self.trajectory: List[FrameRecord] = []
        self.localization_only = False
        self.stats = {"kf_inserted": 0, "pts_created": 0, "ba_runs": 0,
                      "reloc": 0, "aruco_seeded": 0, "loops_closed": 0}
        self.last_loop_kf_count = 0
        self.bow_consistency = loop_closing.ConsistencyTracker(
            cfg.loop.consistency_threshold
        )
        # time-sliced post-loop global BA (the reference's detached GBA
        # thread becomes a few LM iterations amortized into each frame step)
        self.pending_gba_iters = 0
        self.pending_gba_fuse = False
        # GBA problem shapes, bucketed to the LIVE map size at the moment a
        # loop closes (power-of-two padding): a 20-keyframe map then runs
        # its post-loop slices as a K=32 dense-Schur program (~few ms/iter)
        # instead of the full-capacity K=256 PCG program (~77 ms/iter) —
        # fixed bucket shapes keep XLA recompiles rare while the padded
        # FLOPs track the real problem instead of the worst case
        self._gba_shape = None           # (max_cams, max_pts) or None
        # ---- pipelined SLAM-mode state (tracking.pipeline_depth > 0) ----
        # frames whose tracking is dispatched but whose control vector has
        # not been read back yet (the reference's analogue: the tracking
        # thread never blocks on LocalMapping; here the HOST never blocks on
        # the device readback until `pipeline_depth` newer frames are in
        # flight, hiding the relay's ~20 ms round trip)
        self._pending: List = []
        self._ref_kf_dev = None          # device-side reference-KF slot
        self._pending_cull = None        # [2] device (victim, unused) await
        self._pending_loop = None        # (k, det_marker, det_bow) await
        self._stat_futures: List = []    # (key, device scalar) lazy stats
        self._map_phase: List = []       # deferred mapping-phase steps, one
                                         # executed per subsequent frame
        # host mirror of keyframe-slot occupancy: lets the host hand the
        # insert slot to create_keyframe instead of reading it back
        self._kf_valid_host = np.zeros(cfg.map.max_keyframes, bool)
        self._in_rewind = False

    # ------------------------------------------------------------------
    def track_monocular(self, img: np.ndarray, ts: float):
        """Process one grayscale frame ([H, W], 0..255, uint8 or float; a
        device-resident jnp array is used as-is). Returns the world->camera
        pose (Rcw, tcw), or None while uninitialized/lost.

        With cfg.tracking.pipeline_depth > 0 the SLAM-mode return value is a
        pair of DEVICE arrays whose computation may still be in flight (no
        host sync), and LOST/keyframe decisions lag by up to `depth` frames;
        the trajectory records carry the authoritative per-frame state."""
        fid = self.frame_id
        self.frame_id += 1
        if (
            self.state is TrackingState.OK
            and self.cfg.tracking.pipeline_depth > 0
            and not self.localization_only
            and not self._in_rewind
        ):
            # pipelined fast path: frontend + cascade fused into ONE
            # dispatch (tracking.track_full_img) — on relay-attached TPUs
            # every dispatch pays a per-call round trip
            return self._track_pipelined(jnp.asarray(img), fid, ts,
                                         is_img=True)
        frame = make_frame(jnp.asarray(img), self.cam, self.cfg)
        return self._step_frame(frame, fid, ts)

    def _step_frame(self, frame: Frame, fid: int, ts: float):
        if self.state in (TrackingState.NO_IMAGES_YET, TrackingState.NOT_INITIALIZED):
            pose = self._try_initialize(frame, fid, ts)
        elif self.state is TrackingState.OK:
            if (
                self.cfg.tracking.pipeline_depth > 0
                and not self.localization_only
                and not self._in_rewind
            ):
                return self._track_pipelined(frame, fid, ts)
            pose = self._track(frame, fid, ts)
        else:
            pose = self._relocalize(frame, fid, ts)

        # lost soon after initialization => full reset (reference
        # Tracking.cc:458-466: LOST with <=5 keyframes resets the system
        # instead of relocalizing forever). Skipped in localization-only
        # mode, where the map is externally provided and must survive.
        if (
            self.state is TrackingState.LOST
            and not self.localization_only
            and self.n_keyframes <= self.cfg.tracking.reset_if_lost_with_kfs_leq
        ):
            self.reset()

        # drain one slice of any pending post-loop global BA — also while
        # LOST: the reference's GBA thread keeps repairing the map while
        # tracking is down, and relocalization needs the repaired map
        if self.pending_gba_iters > 0 and not self.localization_only:
            self._gba_slice()

        Rcw, tcw = pose if pose is not None else (np.eye(3, dtype=np.float32),
                                                  np.zeros(3, dtype=np.float32))
        self.trajectory.append(
            FrameRecord(fid, ts, np.asarray(Rcw), np.asarray(tcw), self.state)
        )
        return pose

    # ------------------------------------------------------------------
    def track_monocular_batch(self, imgs, ts_list):
        """Localization-mode throughput path: track a chunk of consecutive
        frames in ONE device dispatch + ONE readback (tracking.track_batch).
        Sequential semantics match per-frame track_monocular; if a frame in
        the chunk loses tracking, the remaining frames are re-processed
        through the per-frame relocalization path. Only valid in
        localization-only mode with state OK — otherwise falls back to
        per-frame calls."""
        if not (self.localization_only and self.state is TrackingState.OK
                and self.last_frame is not None):
            return [self.track_monocular(im, t) for im, t in zip(imgs, ts_list)]
        B = len(imgs)
        stack = jnp.stack([jnp.asarray(im) for im in imgs])
        if self.vel is not None:
            vR, vt, hv = self.vel[0], self.vel[1], jnp.asarray(True)
        else:
            vR = jnp.eye(3, dtype=jnp.float32)
            vt = jnp.zeros(3, dtype=jnp.float32)
            hv = jnp.asarray(False)
        ctrls, carry = tracking.track_batch(
            self.map, stack, self.last_pose[0], self.last_pose[1],
            vR, vt, hv,
            self.last_frame.kp_uv, self.last_frame.desc, self.last_obs,
            self.last_frame.kp_valid, self.last_frame.kp_octave,
            self.last_frame.kp_angle,
            jnp.asarray(self.ref_kf), self.cam, self.cfg,
        )
        (Rl, tl, vR2, vt2, _, luv, ldesc, lobs, lval, loct, lang, vis,
         found) = carry
        c = np.asarray(ctrls)                       # ONE readback per chunk
        poses = []
        lost_at = B
        for j in range(B):
            if c[j, 0] < self.cfg.tracking.min_matches_local_map:
                lost_at = j
                break
            Rcw = c[j, 5:14].reshape(3, 3)
            tcw = c[j, 14:17]
            poses.append((Rcw, tcw))
            self.trajectory.append(
                FrameRecord(self.frame_id + j, ts_list[j], Rcw, tcw,
                            TrackingState.OK)
            )
        self.frame_id += lost_at
        if lost_at == B:
            self.map = self.map._replace(pt_visible=vis, pt_found=found)
            self.last_frame = self.last_frame._replace(
                kp_uv=luv, desc=ldesc, kp_valid=lval, kp_octave=loct,
                kp_angle=lang,
            )
            self.last_obs = lobs
            self.last_pose = (Rl, tl)
            self.vel = (vR2, vt2)
            return poses
        # a frame in the chunk lost tracking: enter LOST and reprocess the
        # remainder through the per-frame relocalization path
        self.state = TrackingState.LOST
        self.vel = None
        for j in range(lost_at, B):
            poses.append(self.track_monocular(imgs[j], ts_list[j]))
        return poses

    # ------------------------------------------------------------------
    def localize_stream(self, imgs_ts, chunk: int = 16, depth: int = 2):
        """Pipelined localization-only serving: a generator over (img, ts)
        pairs yielding (frame_id, ts, pose_or_None).

        Up to `depth` chunks are kept IN FLIGHT: chunk k+1 (and k+2, ...)
        are dispatched before chunk k's control vector is read back, so the
        host<->device round trip (per-dispatch latency + readback) and all
        host-side bookkeeping overlap device compute of the chunks already
        queued — on relay-attached TPUs the host only ever blocks when the
        device is `depth` chunks ahead. Dispatches are speculative: if
        chunk k turns out to contain a lost frame, every in-flight chunk
        after it is discarded and the affected frames are reprocessed
        through the per-frame relocalization path (results are identical
        to the sequential path whenever tracking holds — the steady state).

        When `imgs_ts` is a StagedSource with batch == chunk, staged device
        stacks are consumed WHOLE (StagedSource.batches) — no per-frame
        slice + re-stack, which costs dozens of relay dispatches per chunk.

        Requires localization mode and an OK tracking state (same contract
        as track_monocular_batch)."""
        if not (self.localization_only and self.state is TrackingState.OK
                and self.last_frame is not None):
            raise RuntimeError("localize_stream needs localization mode and "
                               "state OK (track or load a map first)")

        def dispatch(stack):
            if self.vel is not None:
                vR, vt, hv = self.vel[0], self.vel[1], jnp.asarray(True)
            else:
                vR = jnp.eye(3, dtype=jnp.float32)
                vt = jnp.zeros(3, dtype=jnp.float32)
                hv = jnp.asarray(False)
            ctrls, carry = tracking.track_batch(
                self.map, stack, self.last_pose[0], self.last_pose[1],
                vR, vt, hv,
                self.last_frame.kp_uv, self.last_frame.desc, self.last_obs,
                self.last_frame.kp_valid, self.last_frame.kp_octave,
                self.last_frame.kp_angle,
                jnp.asarray(self.ref_kf), self.cam, self.cfg,
            )
            # commit the device-side carry immediately (speculative): the
            # next chunk chains on-device without waiting for the readback
            (Rl, tl, vR2, vt2, _, luv, ldesc, lobs, lval, loct, lang,
             vis, found) = carry
            self.map = self.map._replace(pt_visible=vis, pt_found=found)
            self.last_frame = self.last_frame._replace(
                kp_uv=luv, desc=ldesc, kp_valid=lval, kp_octave=loct,
                kp_angle=lang,
            )
            self.last_obs = lobs
            self.last_pose = (Rl, tl)
            self.vel = (vR2, vt2)
            return ctrls

        def emit(ctrls, metas):
            """Validate a finished chunk; returns (results, lost_tail)."""
            c = np.asarray(ctrls)
            out = []
            for j, (fid, ts) in enumerate(metas):
                if c[j, 0] < self.cfg.tracking.min_matches_local_map:
                    return out, metas[j:]
                Rcw = c[j, 5:14].reshape(3, 3)
                tcw = c[j, 14:17]
                self.trajectory.append(
                    FrameRecord(fid, ts, Rcw, tcw, TrackingState.OK)
                )
                out.append((fid, ts, (Rcw, tcw)))
            return out, None

        from collections import deque

        from orb_slam2_aruco_tpu.io.ingest import StagedSource

        depth = max(1, int(depth))
        leftover = deque()      # individual (img, ts) frames (reloc resume)
        exhausted = False

        if isinstance(imgs_ts, StagedSource) and imgs_ts.batch > 1:
            batch_src = imgs_ts.batches()
            frame_src = None
        else:
            batch_src = None
            frame_src = iter(imgs_ts)

        def pull_one():
            """Pull one more source item into `leftover` (a whole staged
            batch counts as one item); False when the source is exhausted."""
            nonlocal exhausted
            if exhausted:
                return False
            try:
                if batch_src is not None:
                    stack, ts_list = next(batch_src)
                    for j, ts in enumerate(ts_list):
                        leftover.append((stack[j], ts))
                else:
                    leftover.append(next(frame_src))
            except StopIteration:
                exhausted = True
                return False
            return True

        def refill_leftover():
            """Ensure at least one frame is in `leftover`."""
            return bool(leftover) or pull_one()

        def next_chunk():
            """Build the next chunk: (stack, ts_list) or None. Fast path: a
            whole staged batch, untouched (zero extra dispatches). Slow path
            (after a rewind, or per-frame sources): stack `leftover`."""
            nonlocal exhausted
            if not leftover and batch_src is not None and not exhausted:
                try:
                    return next(batch_src)
                except StopIteration:
                    exhausted = True
                    return None
            while len(leftover) < chunk and pull_one():
                pass
            if not leftover:
                return None
            items = [leftover.popleft()
                     for _ in range(min(chunk, len(leftover)))]
            stack = jnp.stack([jnp.asarray(im) for im, _ in items])
            return stack, [ts for _, ts in items]

        pending = deque()       # in flight: (ctrls_dev, metas, stack)
        while True:
            # while lost (and nothing in flight), run frames one at a time
            # through the relocalization path until tracking is OK again
            if not pending and self.state is not TrackingState.OK:
                while refill_leftover():
                    im, ts = leftover.popleft()
                    fid = self.frame_id
                    yield (fid, ts, self.track_monocular(im, ts))
                    if self.state is TrackingState.OK:
                        break
                if self.state is not TrackingState.OK:
                    return  # stream ended while lost
            # keep `depth` chunks in flight
            while len(pending) < depth:
                nc = next_chunk()
                if nc is None:
                    break
                stack, ts_list = nc
                metas = []
                for ts in ts_list:
                    metas.append((self.frame_id, ts))
                    self.frame_id += 1
                pending.append((dispatch(stack), metas, stack))
            if not pending:
                return
            # emit the oldest in-flight chunk (blocks on its readback)
            ctrls_p, metas_p, stack_p = pending.popleft()
            results, lost_tail = emit(ctrls_p, metas_p)
            for r in results:
                yield r
            if lost_tail is not None:
                # rewind: discard EVERY speculative chunk and reprocess the
                # lost tail + all speculative frames through the per-frame
                # path (relocalization, then normal tracking). Slicing the
                # held stacks only happens here, on the rare lost path.
                self.state = TrackingState.LOST
                self.vel = None
                k0 = len(results)
                redo = [(stack_p[k0 + j], ts)
                        for j, (_, ts) in enumerate(metas_p[k0:])]
                while pending:
                    _, metas_s, stack_s = pending.popleft()
                    redo += [(stack_s[j], ts)
                             for j, (_, ts) in enumerate(metas_s)]
                self.frame_id = lost_tail[0][0]
                leftover.extendleft(reversed(redo))

    # ------------------------------------------------------------------
    def _try_initialize(self, frame: Frame, fid: int, ts: float):
        cfg = self.cfg
        fctrl = np.asarray(frame.ctrl)   # one read: [n_kp, n_good_markers]
        n_kp = int(fctrl[0])
        n_good_mk = int(fctrl[1])
        if self.init_frame is None:
            if n_kp >= cfg.tracking.min_init_features:
                self.init_frame = frame
                self.init_frame_id = fid
                self.init_ts = ts
                self.init_has_marker = n_good_mk > 0
                self.state = TrackingState.NOT_INITIALIZED
            return None
        metric = True
        cand = initializer.marker_relative_pose(
            self.init_frame, frame, self.cam, cfg
        )
        cctrl = np.asarray(cand.ctrl)    # one read: [ok, err, baseline]
        cand_ok = cctrl[0] > 0.5
        if not cand_ok:
            bad_geometry = float(cctrl[1]) >= cfg.tracking.init_marker_reproj_err
            no_common_marker = float(cctrl[1]) >= 1e8
            if no_common_marker and fid - self.init_frame_id >= 2:
                # markerless fallback: classic H/F bootstrap (unit scale; a
                # later aruco_plane_update supplies metric scale)
                cand = initializer.classic_relative_pose(
                    self.init_frame, frame, self.cam, cfg
                )
                metric = False
                cand_ok = bool(cand.ok)
            if not cand_ok:
                # keep the reference while the only blocker is a small
                # baseline; replace it when geometry is inconsistent
                if bad_geometry and not no_common_marker and n_good_mk > 0:
                    self.init_frame = frame
                    self.init_frame_id = fid
                    self.init_ts = ts
                elif fid - self.init_frame_id > 20:
                    self.init_frame = frame
                    self.init_frame_id = fid
                    self.init_ts = ts
                return None
        # --- create initial map ---------------------------------------
        eye = jnp.eye(3, dtype=jnp.float32)
        zero = jnp.zeros(3, dtype=jnp.float32)
        slots1 = tracking.bind_markers(self.map, self.init_frame)  # all -1
        N = self.init_frame.kp_uv.shape[0]
        no_obs = jnp.full((N,), -1, jnp.int32)
        k1 = self._host_alloc_slot()
        self.map, kf1 = mapping.create_keyframe(
            self.map, self.init_frame, eye, zero, no_obs, slots1,
            self.init_frame_id, self.init_ts, self.cam, cfg, slot=k1,
        )
        slots2 = tracking.bind_markers(self.map, frame)
        k2 = self._host_alloc_slot()
        self.map, kf2 = mapping.create_keyframe(
            self.map, frame, cand.R21, cand.t21, no_obs, slots2,
            fid, ts, self.cam, cfg, slot=k2,
        )
        self.map, n_new = mapping.triangulate_new_points(
            self.map, kf2, kf1, self.cam, cfg, max_new=512
        )
        self.map, chi2 = mapping.bundle_adjust(
            self.map, kf2, self.cam, cfg, max_cams=4, max_pts=1024,
            iters=cfg.optim.global_ba_iters, window_all=True,
        )
        # marker init is metric (IPPE with true side length); classic init
        # leaves scale_done False so aruco_plane_update can rescale later
        self.map = self.map._replace(scale_done=jnp.asarray(metric))
        self.kf_ts64[k1] = self.init_ts
        self.kf_ts64[k2] = ts
        self.n_keyframes = 2
        self.stats["kf_inserted"] += 2
        self.stats["pts_created"] += int(n_new)
        self.ref_kf = k2
        self.prev_kf_slot = k1
        self.last_kf_slot = k2
        self.last_kf_frame_id = fid
        self.last_frame = frame
        Rcw, tcw = cand.R21, cand.t21
        self.last_obs = self.map.kf_obs_point[kf2]
        self.last_pose = (Rcw, tcw)
        self.vel = None
        self.state = TrackingState.OK
        return np.asarray(Rcw), np.asarray(tcw)

    # ------------------------------------------------------------------
    def _track(self, frame: Frame, fid: int, ts: float):
        cfg = self.cfg
        # motion-model prediction on-device (host never touches the pose)
        if self.vel is not None:
            R_pred, t_pred = se3_compose(
                self.vel[0], self.vel[1], self.last_pose[0], self.last_pose[1]
            )
        else:
            R_pred, t_pred = self.last_pose

        out = tracking.track_full(
            self.map, frame, R_pred, t_pred,
            self.last_pose[0], self.last_pose[1],
            self.last_frame.kp_uv, self.last_frame.desc, self.last_obs,
            self.last_frame.kp_valid, self.last_frame.kp_octave,
            self.last_frame.kp_angle,
            jnp.asarray(self.ref_kf), self.cam, cfg,
        )
        # ONE device->host read per frame: the relay's per-readback latency
        # dominates everything else, so all control scalars + the pose travel
        # in a single packed vector
        ctrl = np.asarray(out.ctrl)
        n_map_inliers = int(ctrl[0])
        if ctrl[2] > 0.5:
            self.stats["aruco_seeded"] += 1
        import os as _os
        if _os.environ.get("SLAM_DEBUG_LOOP"):
            print(f"TRKDBG fid={fid} map_inl={n_map_inliers} "
                  f"first={int(ctrl[1])} aruco={ctrl[2]>0.5} "
                  f"ref_fb={ctrl[3]>0.5}")
        # TrackLocalMap success gates (reference Tracking.cc:1286-1292):
        # < 30 inliers fails; < 50 fails if relocalized within the last
        # mMaxFrames frames
        recently_reloc = (
            fid < self.last_reloc_frame_id + cfg.tracking.max_frames_between_kf
        )
        min_ok = (
            cfg.tracking.reloc_min_inliers
            if recently_reloc
            else cfg.tracking.min_matches_local_map
        )
        if n_map_inliers < min_ok:
            self.state = TrackingState.LOST
            return None
        self.map = self.map._replace(
            pt_visible=out.pt_visible, pt_found=out.pt_found
        )
        # reference keyframe re-targeted to the most-sharing local keyframe
        # every frame (reference UpdateLocalKeyFrames, Tracking.cc:1588-1593)
        if int(ctrl[19]) >= 0:
            self.ref_kf = int(ctrl[19])
        Rcw, tcw = out.Rcw, out.tcw
        Rcw_np = ctrl[5:14].reshape(3, 3)
        tcw_np = ctrl[14:17]

        # velocity: T_cur * T_last^-1
        Rl_inv, tl_inv = se3_inverse(*self.last_pose)
        self.vel = se3_compose(Rcw, tcw, Rl_inv, tl_inv)

        # commit the tracking context BEFORE the mapping phase: the insert's
        # point fusion forwards last_obs through merges (_apply_point_remap,
        # the reference's CheckReplacedInLastFrame) — assigning afterwards
        # would clobber the remap with pre-fuse indices
        self.last_frame = frame
        self.last_obs = out.obs_point
        if not self.localization_only:
            if self._kf_decision(ctrl, fid, n_map_inliers, recently_reloc):
                k_ins = self._insert_keyframe(frame, Rcw, tcw, out.obs_point,
                                              out.slots, fid, ts,
                                              mk_old=out.old_flags)
                if k_ins is not None:
                    # the mapping phase (local BA / scale correction) may have
                    # moved this keyframe: the next frame must track from the
                    # POST-BA pose, or every BA update degrades the motion
                    # model and local-map projection windows (the reference
                    # re-derives the last pose from its reference keyframe,
                    # Tracking::UpdateLastFrame)
                    Rcw = self.map.kf_Rcw[k_ins]
                    tcw = self.map.kf_tcw[k_ins]

        self.last_pose = (Rcw, tcw)
        return Rcw_np, tcw_np

    # ------------------------------------------------------------------
    def _kf_decision(self, ctrl, fid, n_map_inliers, recently_reloc) -> bool:
        """NeedNewKeyFrame (reference Tracking.cc:1296-1392):
         * a new good marker not yet in the map always inserts (:1305-1315)
         * no insert right after relocalization when the map is mature
         * (c1a: >= mMaxFrames since last KF | c1b: >= mMinFrames and the
           mapping phase is idle — always true here) AND c2: inliers <
           thRefRatio * nRefMatches with inliers > 15 (thRefRatio = 0.4
           while the map has < 2 KFs)."""
        cfg = self.cfg
        new_good = ctrl[4] > 0.5
        since_kf = fid - self.last_kf_frame_id
        nkfs = self.n_keyframes
        max_f = cfg.tracking.max_frames_between_kf
        n_ref = int(ctrl[18] if nkfs <= 2 else ctrl[17])
        th_ratio = 0.4 if nkfs < 2 else cfg.tracking.kf_ref_ratio
        reloc_block = recently_reloc and nkfs > max_f
        c1a = since_kf >= max_f
        c1b = since_kf >= cfg.tracking.min_frames_between_kf
        c2 = n_map_inliers < n_ref * th_ratio and n_map_inliers > 15
        import os as _os
        if _os.environ.get("SLAM_DEBUG_KF"):
            print(f"KFDBG fid={fid} inl={n_map_inliers} n_ref={n_ref} "
                  f"since={since_kf} c1a={c1a} c1b={c1b} c2={c2} "
                  f"block={reloc_block} new_good={bool(new_good)}")
        return bool(new_good or ((c1a or c1b) and c2 and not reloc_block))

    # ------------------------------------------------------------------
    # pipelined SLAM-mode tracking (cfg.tracking.pipeline_depth > 0)
    # ------------------------------------------------------------------
    def _track_pipelined(self, frame, fid: int, ts: float,
                         is_img: bool = False):
        """Dispatch this frame's full tracking step and DEFER the control-
        vector readback: the device-side tracking context (pose, velocity,
        last-frame features, visibility counters, reference keyframe) chains
        frame-to-frame entirely on device, so the host only blocks on a
        frame's scalars once `pipeline_depth` newer frames are in flight —
        by then the result has long been computed and transferred. This is
        the TPU-native analogue of the reference's tracking thread running
        ahead of LocalMapping (System.cc:96-101): keyframe decisions and
        LOST detection lag by up to `depth` frames, exactly like the
        reference's queue latency."""
        cfg = self.cfg
        if self.vel is not None:
            R_pred, t_pred = se3_compose(
                self.vel[0], self.vel[1], self.last_pose[0], self.last_pose[1]
            )
        else:
            R_pred, t_pred = self.last_pose
        ref_dev = (
            self._ref_kf_dev if self._ref_kf_dev is not None
            else jnp.asarray(self.ref_kf, jnp.int32)
        )
        if is_img:
            frame, out = tracking.track_full_img(
                self.map, frame, R_pred, t_pred,
                self.last_pose[0], self.last_pose[1],
                self.last_frame.kp_uv, self.last_frame.desc, self.last_obs,
                self.last_frame.kp_valid, self.last_frame.kp_octave,
                self.last_frame.kp_angle,
                ref_dev, self.cam, cfg,
            )
        else:
            out = tracking.track_full(
                self.map, frame, R_pred, t_pred,
                self.last_pose[0], self.last_pose[1],
                self.last_frame.kp_uv, self.last_frame.desc, self.last_obs,
                self.last_frame.kp_valid, self.last_frame.kp_octave,
                self.last_frame.kp_angle,
                ref_dev, self.cam, cfg,
            )
        try:
            out.ctrl.copy_to_host_async()
        except AttributeError:      # CPU arrays lack the async-copy hook
            pass
        # commit the device-side chain immediately (speculative)
        self.map = self.map._replace(
            pt_visible=out.pt_visible, pt_found=out.pt_found
        )
        Rl_inv, tl_inv = se3_inverse(*self.last_pose)
        self.vel = se3_compose(out.Rcw, out.tcw, Rl_inv, tl_inv)
        self.last_pose = (out.Rcw, out.tcw)
        self.last_frame = frame
        self.last_obs = out.obs_point
        ref_new = out.ctrl[19].astype(jnp.int32)
        self._ref_kf_dev = jnp.where(ref_new >= 0, ref_new, ref_dev)
        self._pending.append((fid, ts, frame, out))
        while len(self._pending) > cfg.tracking.pipeline_depth:
            if not self._process_oldest():
                break
        return out.Rcw, out.tcw

    def flush_pipeline(self):
        """Process every in-flight frame's control vector (host decisions:
        trajectory records, keyframe insertion, LOST handling) and resolve
        all deferred readbacks. Any API that inspects host state (stats,
        trajectories, mode switches, checkpoints) funnels through here."""
        while self._pending:
            if not self._process_oldest():
                break
        self._drain_map_phase()
        self._resolve_cull()
        self._resolve_loop_detection()
        for key, v in self._stat_futures:
            self.stats[key] = self.stats.get(key, 0) + int(v)
        self._stat_futures = []

    def _apply_point_remap(self, merged_to):
        """Forward the live tracking context through a point merge
        (CheckReplacedInLastFrame, reference Tracking.cc:836): last_obs and
        any in-flight frames' obs_point must follow MapPoint::Replace."""
        L = self.map.L

        def remap(obs):
            return jnp.where(
                obs >= 0, merged_to[jnp.clip(obs, 0, L - 1)], obs
            )

        if self.last_obs is not None:
            self.last_obs = remap(self.last_obs)
        if self._pending:
            self._pending = [
                (fid, ts, frame, out._replace(obs_point=remap(out.obs_point)))
                for (fid, ts, frame, out) in self._pending
            ]

    def _drain_map_phase(self):
        """Run every remaining deferred mapping-phase step inline."""
        while self._map_phase:
            _, step = self._map_phase.pop(0)
            step()

    def _process_oldest(self) -> bool:
        """Read the oldest in-flight frame's control vector and apply the
        host-side decisions. Returns False when a rewind happened (LOST) —
        the remaining in-flight frames were reprocessed through the
        synchronous paths."""
        cfg = self.cfg
        fid, ts, frame, out = self._pending.pop(0)
        # deferred readbacks from the PREVIOUS keyframe insert have had a
        # full frame of compute to land — resolve them first (cheap now)
        self._resolve_cull()
        self._resolve_loop_detection()
        ctrl = np.asarray(out.ctrl)
        n_map_inliers = int(ctrl[0])
        if ctrl[2] > 0.5:
            self.stats["aruco_seeded"] += 1
        recently_reloc = (
            fid < self.last_reloc_frame_id + cfg.tracking.max_frames_between_kf
        )
        min_ok = (
            cfg.tracking.reloc_min_inliers
            if recently_reloc
            else cfg.tracking.min_matches_local_map
        )
        if n_map_inliers < min_ok:
            self._rewind_lost(fid, ts)
            return False
        if int(ctrl[19]) >= 0:
            self.ref_kf = int(ctrl[19])
        Rcw_np = ctrl[5:14].reshape(3, 3)
        tcw_np = ctrl[14:17]
        self.trajectory.append(
            FrameRecord(fid, ts, Rcw_np, tcw_np, TrackingState.OK)
        )
        if self._kf_decision(ctrl, fid, n_map_inliers, recently_reloc):
            self._insert_keyframe(
                frame, out.Rcw, out.tcw, out.obs_point, out.slots, fid, ts,
                mk_old=out.old_flags, sync=False,
            )
        elif self._map_phase:
            # one deferred mapping-phase step per tracked frame: the device
            # interleaves ~15 ms of mapping with each tracking dispatch
            # instead of ~100 ms after every insert
            _, step = self._map_phase.pop(0)
            step()
        elif self.pending_gba_iters > 0:
            self._gba_slice()       # device-only: stays in the pipeline
        return True

    def _rewind_lost(self, fid: int, ts: float):
        """The frame processed `depth` frames late turned out LOST: the
        speculatively dispatched newer frames chained from a bad pose —
        discard their results and replay them through the synchronous
        relocalization path (the same speculative-rewind contract as
        localize_stream)."""
        self.state = TrackingState.LOST
        self.vel = None
        self._ref_kf_dev = None
        # finish the previous insert's sliced mapping phase before replaying
        # frames through the synchronous path (which assumes a settled map)
        self._drain_map_phase()
        rest = list(self._pending)
        self._pending = []
        self.trajectory.append(
            FrameRecord(fid, ts, np.eye(3, dtype=np.float32),
                        np.zeros(3, dtype=np.float32), self.state)
        )
        self._in_rewind = True
        try:
            for (pfid, pts, pframe, _out) in rest:
                self._step_frame(pframe, pfid, pts)
        finally:
            self._in_rewind = False
        # auto-reset (reference Tracking.cc:458-466) if the replay did not
        # recover and the map is immature
        if (
            self.state is TrackingState.LOST
            and not self.localization_only
            and self.n_keyframes <= self.cfg.tracking.reset_if_lost_with_kfs_leq
        ):
            self.reset()

    # ------------------------------------------------------------------
    def _host_alloc_slot(self) -> int:
        free = np.flatnonzero(~self._kf_valid_host)
        if len(free) == 0:
            return -1
        k = int(free[0])
        self._kf_valid_host[k] = True
        return k

    def _resolve_cull(self):
        if self._pending_cull is None:
            return
        victim = self._pending_cull
        self._pending_cull = None
        v = int(victim)
        if v < 0:
            return
        self._kf_valid_host[v] = False
        self.n_keyframes -= 1
        self.stats["kf_culled"] = self.stats.get("kf_culled", 0) + 1
        if v == self.prev_kf_slot:
            self.prev_kf_slot = self.last_kf_slot
        if v == self.ref_kf:
            self.ref_kf = self.last_kf_slot

    def _insert_keyframe(self, frame, Rcw, tcw, obs_point, slots, fid, ts,
                         mk_old=None, sync=True):
        """The whole mapping phase (LocalMapping::Run equivalent) for one new
        keyframe. With sync=False every device->host readback is DEFERRED —
        the victim of keyframe culling and the loop-detection flags are read
        one frame later (by then their compute has drained), per-insert
        stats accumulate as device scalars, and the tracking context is
        rescaled/re-anchored entirely on device — so a keyframe insert adds
        dispatches to the device queue but never stalls the host pipeline."""
        cfg = self.cfg
        # a new insert before the previous one's sliced phase drained: run
        # the remainder inline first (covisibility/triangulation for THIS
        # keyframe must see the settled previous phase)
        self._drain_map_phase()
        # resolve last insert's deferred work before using host counters
        self._resolve_cull()
        self._resolve_loop_detection()
        if self.n_keyframes >= cfg.map.max_keyframes:
            # pool at capacity: force-cull the most redundant keyframe so the
            # map keeps tracking on long sequences instead of silently
            # refusing inserts (the fixed-slot analogue of the reference's
            # unbounded growth + KeyFrameCulling). This branch blocks on the
            # victim readback in BOTH modes — the insert slot depends on it
            self.map, victim = mapping.cull_keyframes(
                self.map, jnp.asarray(self.last_kf_slot), cfg, force=True
            )
            v = int(victim)
            if v < 0:
                return None  # everything protected (tiny maps only)
            self._kf_valid_host[v] = False
            self.n_keyframes -= 1
            self.stats["kf_culled"] = self.stats.get("kf_culled", 0) + 1
            if v == self.prev_kf_slot:
                self.prev_kf_slot = self.last_kf_slot
            if v == self.ref_kf:
                self.ref_kf = self.last_kf_slot
        k = self._host_alloc_slot()
        if k < 0:
            return None
        self.map, _k = mapping.create_keyframe(
            self.map, frame, Rcw, tcw, obs_point, slots, fid, ts, self.cam,
            cfg, mk_old=mk_old, slot=k,
        )
        self.n_keyframes += 1
        self.stats["kf_inserted"] += 1
        self.kf_ts64[k] = ts
        prev = self.last_kf_slot
        self.prev_kf_slot = prev
        self.last_kf_slot = k
        self.last_kf_frame_id = fid
        self.ref_kf = k
        self._ref_kf_dev = None
        steps = self._mapping_phase_steps(k, fid, sync)
        if sync:
            for _, step in steps:
                step()
        else:
            # pipelined mode: the mapping phase runs SLICED, one step per
            # subsequent tracked frame (_process_oldest) — the device never
            # executes ~100 ms of mapping between two tracking dispatches,
            # which is what blew the p90 latency past the 33 ms frame
            # budget. The reference equivalently never blocks tracking on
            # LocalMapping (System.cc:96-101, mbAbortBA LocalMapping.cc:94).
            self._map_phase.extend(steps)
        return k

    def _mapping_phase_steps(self, k: int, fid: int, sync: bool):
        """The post-insert mapping phase (LocalMapping::Run equivalent) as a
        list of (name, thunk) steps: triangulation, point culling + fusion,
        point stats + marker plane update, the local BA in
        cfg.optim.local_ba_slices slices, keyframe culling, loop detection."""
        cfg = self.cfg
        k_dev = jnp.asarray(k)

        def tri():
            # triangulate against the top-N covisible neighbors in one
            # dispatch (reference top-20 covisible KFs, LocalMapping.cc:
            # 222-229, with the baseline/scene-depth > 1% neighbor gate)
            self.map, n_new = mapping.triangulate_vs_covisible(
                self.map, k_dev, self.cam, cfg,
                n_neighbors=cfg.map.triangulation_neighbors, max_new=256,
            )
            if sync:
                self.stats["pts_created"] += int(n_new)
            else:
                self._stat_futures.append(("pts_created", n_new))

        def fuse():
            self.map, _ = mapping.cull_points(
                self.map, cfg.map.cull_found_ratio
            )
            # merge duplicated points (SearchInNeighbors/Fuse)
            self.map, _n_fused, merged_to = mapping.fuse_duplicates(
                self.map, k_dev, self.cam, cfg
            )
            self._apply_point_remap(merged_to)
            self.map = mapping.update_point_stats(self.map, cfg)

        def stats_plane():
            self.map = mapping.distinctive_descriptors(self.map, cfg, kf=k_dev)
            # marker plane measurement + possible one-shot scale correction
            self.map, s_corr = mapping.aruco_plane_update(
                self.map, k_dev, self.cam, cfg
            )
            if sync:
                if abs(float(s_corr) - 1.0) > 1e-6:
                    # rescale the tracking context too
                    self.last_pose = (
                        self.last_pose[0], self.last_pose[1] * float(s_corr)
                    )
                    self.vel = None
                    self.stats["scale_corrections"] = (
                        self.stats.get("scale_corrections", 0) + 1
                    )
            else:
                # device-side rescale: a no-op when s == 1; the velocity's
                # translation scales with the map like everything metric, and
                # so do the in-flight frames' speculative poses
                self.last_pose = (self.last_pose[0], self.last_pose[1] * s_corr)
                if self.vel is not None:
                    self.vel = (self.vel[0], self.vel[1] * s_corr)
                if self._pending:
                    patched = []
                    for (pfid, pts_, pframe, pout) in self._pending:
                        ctrl2 = pout.ctrl.at[14:17].set(
                            pout.ctrl[14:17] * s_corr
                        )
                        patched.append((
                            pfid, pts_, pframe,
                            pout._replace(tcw=pout.tcw * s_corr, ctrl=ctrl2),
                        ))
                    self._pending = patched

        def ba_slice(iters, count_run):
            def run():
                if self.n_keyframes <= 2 or not self._kf_valid_host[k]:
                    return
                R_pre = self.map.kf_Rcw[k]
                t_pre = self.map.kf_tcw[k]
                self.map, _chi2 = mapping.bundle_adjust(
                    self.map, k_dev, self.cam, cfg,
                    max_cams=cfg.map.local_ba_window, max_pts=2048,
                    iters=iters,
                    max_fixed=cfg.map.local_ba_fixed_ring,
                )
                if count_run:
                    self.stats["ba_runs"] += 1
                if not sync:
                    # later frames already chained off the PRE-BA pose:
                    # re-anchor the tracking context by this keyframe's BA
                    # delta, on device (the reference re-derives frame poses
                    # from their reference KF after mapping updates,
                    # Tracking::UpdateLastFrame)
                    Ri, ti = se3_inverse(R_pre, t_pre)
                    Rrel, trel = se3_compose(
                        self.last_pose[0], self.last_pose[1], Ri, ti
                    )
                    self.last_pose = se3_compose(
                        Rrel, trel, self.map.kf_Rcw[k], self.map.kf_tcw[k]
                    )
            return run

        def kf_cull():
            if self.n_keyframes <= 2 or not self._kf_valid_host[k]:
                return
            # keyframe culling (90% redundancy rule, marker protection)
            self.map, victim = mapping.cull_keyframes(self.map, k_dev, cfg)
            if sync:
                self._pending_cull = victim
                self._resolve_cull()
            else:
                try:
                    victim.copy_to_host_async()
                except AttributeError:
                    pass
                self._pending_cull = victim

        def loop_det():
            # ---- loop closing phase (LoopClosing::Run equivalent) --------
            if not self._kf_valid_host[k]:
                return
            if (
                self.n_keyframes - self.last_loop_kf_count
                >= cfg.loop.min_kfs_between_loops
            ):
                det_mk, det_bow = loop_closing.detect_loops(
                    self.map, k_dev, min_gap=cfg.loop.min_kfs_between_loops,
                )
                if not sync:
                    for arr in (det_mk.found, det_mk.kf_loop,
                                det_mk.marker_slot,
                                det_bow.found, det_bow.kf_loop):
                        try:
                            arr.copy_to_host_async()
                        except AttributeError:
                            pass
                self._pending_loop = (k, fid, det_mk, det_bow)
                if sync:
                    self._resolve_loop_detection()

        # slice the local BA over the frames after the insert: >= the same
        # total iterations, re-seeded LM per slice. Every slice uses the
        # SAME static iteration count (one compiled program); the monotone
        # early-exit makes warm continuation slices cheap.
        n_slices = max(1, int(cfg.optim.local_ba_slices)) if not sync else 1
        total = cfg.optim.local_ba_iters_second
        per = -(-total // n_slices)          # ceil
        if sync:
            per = total
        ba_steps = [
            (f"ba[{per}]", ba_slice(per, i == 0)) for i in range(n_slices)
        ]
        def cull_and_detect():
            kf_cull()
            loop_det()

        return [
            ("triangulate", tri),
            ("fuse+stats", fuse),
            ("desc+plane", stats_plane),
            *ba_steps,
            ("kf_cull+loop", cull_and_detect),
        ]

    # ------------------------------------------------------------------
    def _resolve_loop_detection(self):
        """Read back a deferred loop-detection result and, when a loop is
        found and verified, run the (rare, inherently host-sequential) Sim3 +
        correction path (ComputeSim3ByAruco / CorrectLoopByAruco,
        LoopClosing.cc:362-887)."""
        if self._pending_loop is None:
            return
        k, fid, det_mk, det_bow = self._pending_loop
        self._pending_loop = None
        cfg = self.cfg
        import os as _os2
        if _os2.environ.get("SLAM_DEBUG_LOOP"):
            print(f"RESDBG fid={fid} kf={k} mk_found={bool(det_mk.found)} "
                  f"mk_loop={int(det_mk.kf_loop)} "
                  f"bow_found={bool(det_bow.found)} "
                  f"bow_loop={int(det_bow.kf_loop)} "
                  f"valid={bool(self._kf_valid_host[k])}")
        if not self._kf_valid_host[k]:
            return                     # the detection keyframe was culled
        if bool(det_mk.found):
            det = det_mk
        elif bool(det_bow.found) and self.bow_consistency.update(
            self.map, int(det_bow.kf_loop)
        ):
            # BoW candidates need 3-consecutive-consistency (DetectLoop)
            det = det_bow
        else:
            return
        self.stats["loops_detected"] = self.stats.get("loops_detected", 0) + 1
        import os as _os
        if _os.environ.get("SLAM_DEBUG_LOOP"):
            print(f"LOOPDBG fid={fid} kf={k} kf_loop={int(det.kf_loop)} "
                  f"marker_slot={int(det.marker_slot)}")
        if int(det.marker_slot) >= 0:
            cand = loop_closing.compute_sim3(
                self.map, jnp.asarray(k), det.kf_loop,
                det.marker_slot, self.cam, cfg,
            )
        else:
            cand = loop_closing.compute_sim3_classic(
                self.map, jnp.asarray(k), det.kf_loop, self.cam, cfg,
            )
        if _os.environ.get("SLAM_DEBUG_LOOP"):
            print(f"SIM3ACC fid={fid} ok={bool(cand.ok)} "
                  f"s={float(cand.s):.4f} n={int(cand.n_inliers)} "
                  f"marker={int(det.marker_slot) >= 0}")
        if bool(cand.ok):
            ref = jnp.asarray(self.ref_kf)
            R_ref0 = self.map.kf_Rcw[ref]
            t_ref0 = self.map.kf_tcw[ref]
            self.map, _ = loop_closing.correct_loop(
                self.map, jnp.asarray(k), det.kf_loop,
                cand.s, cand.R, cand.t, self.cam, cfg,
            )
            # fuse the two sides of the loop now (SearchAndFuse,
            # LoopClosing.cc:1074-1100) — tracking needs the merged
            # associations immediately
            self.map, _, merged_to = mapping.fuse_duplicates(
                self.map, jnp.asarray(k), self.cam, cfg,
                restrict_covisible=False, radius_scale=0.015,
            )
            self._apply_point_remap(merged_to)
            # re-anchor the tracking context through the correction: the
            # essential graph moves the reference keyframe (distributing
            # drift), and the next frame must seed consistently with the
            # CORRECTED map (the reference holds mMutexMapUpdate across
            # Track() for exactly this reason, Tracking.cc:202)
            if self.last_pose is not None:
                R_ref1 = self.map.kf_Rcw[ref]
                t_ref1 = self.map.kf_tcw[ref]
                Ri, ti = se3_inverse(R_ref0, t_ref0)
                Rrel, trel = se3_compose(
                    self.last_pose[0], self.last_pose[1], Ri, ti
                )
                self.last_pose = se3_compose(Rrel, trel, R_ref1, t_ref1)
            # global BA runs TIME-SLICED between subsequent frames
            # instead of inline (the reference's detached GBA thread,
            # LoopClosing.cc:880): a new loop closure before the
            # slices drain simply restarts the schedule — the
            # reference's mbStopGBA abort-and-restart protocol
            # (LoopClosing.cc:660-676)
            self.pending_gba_iters = cfg.optim.post_loop_gba_iters
            self.pending_gba_fuse = True
            # size the GBA program to the LIVE map (one scalar readback at
            # this already host-sequential moment): power-of-two buckets
            # with headroom for keyframes/points inserted while the slices
            # drain over the next frames (re-checked per slice — see
            # _gba_bucket_shape)
            self._gba_shape = self._gba_bucket_shape()
            self._gba_shape_kfs = self.n_keyframes
            # point-bucket rotation across slices starts from slot 0
            self._gba_pt_offset = 0
            # TWO stabilization slices INLINE: the very next frame
            # must track against a self-consistent map — a freshly
            # corrected seam starts with ~0.1 m distributed residual and
            # one 2-iteration slice is not enough to bring the current
            # keyframe's associations back under the match windows (the
            # rest of the iterations amortize across subsequent frames)
            self._gba_slice()
            self._gba_slice()
            self.last_loop_kf_count = self.n_keyframes
            self.stats["loops_closed"] += 1
        else:
            self.stats["loop_sim3_rejected"] = (
                self.stats.get("loop_sim3_rejected", 0) + 1
            )
            self.stats.setdefault("_rej_inl", []).append(int(cand.n_inliers))

    # ------------------------------------------------------------------
    def _gba_bucket_shape(self):
        """Power-of-two (keyframe, point) bucket sizes covering the LIVE map
        with headroom (one pt_valid scalar readback)."""
        cfg = self.cfg
        n_pts_live = int(jnp.sum(self.map.pt_valid))
        kb = 8
        while kb < min(self.n_keyframes + 8, cfg.map.max_keyframes):
            kb *= 2
        kb = min(kb, cfg.map.max_keyframes)
        pb = 1024
        while pb < min(int(n_pts_live * 1.25) + 256, cfg.map.max_points):
            pb *= 2
        pb = min(pb, 8192, cfg.map.max_points)
        return kb, pb

    def _gba_slice(self):
        """One slice of the pending post-loop global BA (RunGlobalBundle-
        Adjustment, reference LoopClosing.cc:1132-1236, amortized): a few LM
        iterations over the WHOLE map, then re-anchor the tracking context to
        the moved reference keyframe (the reference re-derives frame poses
        relative to their reference KF after GBA, :1164-1224)."""
        cfg = self.cfg
        ref = jnp.asarray(self.ref_kf)
        R_ref0 = self.map.kf_Rcw[ref]
        t_ref0 = self.map.kf_tcw[ref]
        if self._gba_shape is not None:
            # keyframes/points inserted while the slices drain can exceed
            # the loop-time headroom; silently capping would drop the oldest
            # keyframes from the global adjustment — grow the bucket when
            # the keyframe count moved (point recount only then: it costs a
            # device readback, and points only grow alongside inserts)
            if self.n_keyframes != getattr(self, "_gba_shape_kfs", -1):
                kb0, pb0 = self._gba_shape
                kb1, pb1 = self._gba_bucket_shape()
                self._gba_shape = (max(kb0, kb1), max(pb0, pb1))
                self._gba_shape_kfs = self.n_keyframes
            gba_cams, gba_pts = self._gba_shape
        else:
            gba_cams = cfg.map.max_keyframes
            gba_pts = min(8192, cfg.map.max_points)
        # rotate the point bucket across slices (reference GBA optimizes
        # EVERY map point, Optimizer.cc:98-166 — with a fixed bucket the
        # same lowest slots would be re-selected every slice and the rest
        # of a large map would only ever be rigidly carried by its ref KF)
        pt_off = getattr(self, "_gba_pt_offset", 0)
        if cfg.optim.distributed_gba and len(jax.devices()) > 1:
            from orb_slam2_aruco_tpu.parallel import dist_ba

            if getattr(self, "_gba_mesh", None) is None:
                self._gba_mesh = dist_ba.make_mesh()
            self.map, _ = mapping.bundle_adjust_distributed(
                self.map, jnp.asarray(self.last_kf_slot), self.cam, cfg,
                self._gba_mesh,
                max_cams=gba_cams, max_pts=gba_pts,
                iters=cfg.optim.gba_slice_iters, window_all=True,
                pt_offset=pt_off,
            )
        else:
            self.map, _ = mapping.bundle_adjust(
                self.map, jnp.asarray(self.last_kf_slot), self.cam, cfg,
                max_cams=gba_cams, max_pts=gba_pts,
                iters=cfg.optim.gba_slice_iters, window_all=True,
                pt_offset=pt_off,
            )
        self._gba_pt_offset = (pt_off + gba_pts) % cfg.map.max_points
        self.pending_gba_iters -= cfg.optim.gba_slice_iters
        self.stats["gba_slices"] = self.stats.get("gba_slices", 0) + 1
        # halfway through: one more whole-map fuse — duplicates that only
        # align after the first BA iterations merge here (the reference's
        # second SearchAndFuse effect)
        if (
            self.pending_gba_fuse
            and self.pending_gba_iters <= cfg.optim.post_loop_gba_iters // 2
        ):
            self.map, _, merged_to = mapping.fuse_duplicates(
                self.map, jnp.asarray(self.last_kf_slot), self.cam, cfg,
                restrict_covisible=False,
            )
            self._apply_point_remap(merged_to)
            self.pending_gba_fuse = False
        # re-anchor last_pose: T_last' = (T_last * T_ref0^-1) * T_ref1
        if self.last_pose is not None:
            R_ref1 = self.map.kf_Rcw[ref]
            t_ref1 = self.map.kf_tcw[ref]
            Ri, ti = se3_inverse(R_ref0, t_ref0)
            Rrel, trel = se3_compose(self.last_pose[0], self.last_pose[1],
                                     Ri, ti)
            self.last_pose = se3_compose(Rrel, trel, R_ref1, t_ref1)

    def flush(self):
        """Drain all pending amortized work (pipelined frames, deferred
        readbacks, post-loop global BA slices) — call before reading final
        trajectories, like joining the reference's GBA thread at shutdown
        (System::Shutdown, System.cc:205-224)."""
        self.flush_pipeline()
        while self.pending_gba_iters > 0:
            self._gba_slice()

    # ------------------------------------------------------------------
    def _relocalize(self, frame: Frame, fid: int, ts: float):
        """Marker relocalization (RelocalizationByAruco, Tracking.cc:
        1665-1739): a single bound good marker gives the camera pose."""
        cfg = self.cfg
        slots = tracking.bind_markers(self.map, frame)
        ok, R0, t0, err = tracking.aruco_pose_candidate(
            self.map, frame, slots, self.cam, cfg
        )
        tr = None
        if bool(ok):
            # the reference matches against the marker's OBSERVING keyframes
            # and runs TrackLocalMap on that neighborhood (Tracking.cc:1694+)
            # — never the whole map: a whole-map projection on a revisit
            # would silently re-link the old area instead of letting loop
            # closure correct it
            kf_mk = tracking.marker_observer_kf(self.map, slots)
            if int(kf_mk) >= 0:
                tr0 = tracking.track_vs_keyframe(
                    self.map, frame, slots, kf_mk, R0, t0, self.cam, cfg
                )
                pt_local, _ = tracking.local_point_mask(
                    self.map, tr0.obs_point, cfg.tracking.max_local_keyframes
                )
                (tr, (vis, found)) = tracking.track_local_map(
                    self.map, frame, slots, tr0.Rcw, tr0.tcw, tr0.obs_point,
                    self.cam, cfg, pt_candidates=pt_local,
                )
                # acceptance = the reference's recently-relocalized
                # TrackLocalMap gate: >= 50 local-map inliers
                # (Tracking.cc:1286-1288, reloc_min_inliers)
                if int(tr.n_inliers) < cfg.tracking.reloc_min_inliers:
                    tr = None
        if tr is None:
            # BoW relocalization fallback (Relocalization, Tracking.cc:1741+)
            idx, vals, keep = tracking.reloc_candidates(self.map, frame, cfg)
            for c in range(len(np.asarray(idx))):
                if not bool(keep[c]):
                    continue
                cand = tracking.reloc_pnp(
                    self.map, frame, slots, idx[c], self.cam, cfg
                )
                # nGood >= 10 to bother augmenting (Tracking.cc:1848), then
                # the projection-augmented pose must reach >= 50 inliers
                # (Tracking.cc:1856-1895)
                if int(cand.n_inliers) >= cfg.tracking.min_inliers_track:
                    pt_local, _ = tracking.local_point_mask(
                        self.map, cand.obs_point,
                        cfg.tracking.max_local_keyframes,
                    )
                    (tr, (vis, found)) = tracking.track_local_map(
                        self.map, frame, slots, cand.Rcw, cand.tcw,
                        cand.obs_point, self.cam, cfg,
                        pt_candidates=pt_local,
                    )
                    if int(tr.n_inliers) >= cfg.tracking.reloc_min_inliers:
                        break
                    tr = None
        if tr is None:
            return None
        self.map = self.map._replace(pt_visible=vis, pt_found=found)
        self.state = TrackingState.OK
        self.stats["reloc"] += 1
        self.last_reloc_frame_id = fid
        import os as _os
        if _os.environ.get("SLAM_DEBUG_LOOP"):
            print(f"RELOC fid={fid} marker_ok={bool(ok)} "
                  f"n_inliers={int(tr.n_inliers)}")
        self.last_frame = frame
        self.last_obs = tr.obs_point
        self.last_pose = (tr.Rcw, tr.tcw)
        self.vel = None
        return np.asarray(tr.Rcw), np.asarray(tr.tcw)

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """System::ActivateLocalizationMode — stop inserting keyframes."""
        self.flush_pipeline()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """System::Reset — clear the map and all tracking context."""
        self._pending = []
        self._map_phase = []
        self._pending_cull = None
        self._pending_loop = None
        self._stat_futures = []
        self._ref_kf_dev = None
        self._kf_valid_host = np.zeros(self.cfg.map.max_keyframes, bool)
        self.map = empty_map(self.cfg)
        self.state = TrackingState.NO_IMAGES_YET
        self.n_keyframes = 0
        self.last_kf_frame_id = -(10**9)
        self.last_reloc_frame_id = -(10**9)
        self.last_frame = None
        self.last_obs = None
        self.last_pose = None
        self.vel = None
        self.init_frame = None
        self.kf_ts64 = np.zeros(self.cfg.map.max_keyframes, np.float64)
        self.bow_consistency.reset()
        self.pending_gba_iters = 0
        self.pending_gba_fuse = False
        self._gba_shape = None

    def get_trajectory(self):
        self.flush_pipeline()
        return self.trajectory

    def keyframe_trajectory(self):
        """Final keyframe poses from the (loop-corrected) map — the
        reference's SaveKeyFrameTrajectoryTUM source (System.cc:287-321).
        Returns (frame_ids [n], timestamps [n] float64, Rcw [n,3,3],
        tcw [n,3]) sorted by frame."""
        self.flush()   # drain any pending post-loop GBA slices first
        valid = np.asarray(self.map.kf_valid)
        fids = np.asarray(self.map.kf_frame_id)[valid]
        tss = self.kf_ts64[valid]
        Rcw = np.asarray(self.map.kf_Rcw)[valid]
        tcw = np.asarray(self.map.kf_tcw)[valid]
        order = np.argsort(fids)
        return fids[order], tss[order], Rcw[order], tcw[order]

    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """System::SaveMap equivalent (markers included)."""
        from orb_slam2_aruco_tpu.io import checkpoint

        self.flush()
        checkpoint.save_map(path, self.map, kf_ts64=self.kf_ts64)

    def load_map(self, path: str):
        """System::LoadMap equivalent: load a checkpoint and enter
        localization-only tracking (the reference reconstructs KeyFrames via
        InitKeyFrame/SystemSetting; here the checkpoint is the full map
        state, so nothing needs rebuilding — including markers and retrieval
        signatures, which the reference loses)."""
        from orb_slam2_aruco_tpu.io import checkpoint

        self._pending = []
        self._map_phase = []
        self._pending_cull = None
        self._pending_loop = None
        self._stat_futures = []
        self._ref_kf_dev = None
        self.map = checkpoint.load_map(path)
        self._kf_valid_host = np.asarray(self.map.kf_valid).copy()
        ts64 = checkpoint.load_extras(path).get("kf_ts64")
        if ts64 is not None and ts64.shape == self.kf_ts64.shape:
            self.kf_ts64 = np.asarray(ts64, np.float64)
        else:
            self.kf_ts64 = np.asarray(self.map.kf_ts, np.float64).copy()
        self.n_keyframes = int(self.map.num_keyframes())
        self.state = TrackingState.LOST  # relocalize against the loaded map
        self.localization_only = True
        self.last_frame = None
        self.last_obs = None
        self.last_pose = None
        self.vel = None
