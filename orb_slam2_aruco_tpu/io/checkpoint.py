"""Map checkpoint save/load.

Replaces Map::Save/Load + SystemSetting + InitKeyFrame (reference
src/Map.cc:219-531, src/SystemSetting.cc, src/InitKeyFrame.cc) — and fixes
the reference's gap: markers ARE serialized (the reference loses all
MapArucos on load, KeyFrame.cc:77 / SURVEY.md §3.5).

Because the world map is one pytree of arrays, a checkpoint is a single
npz file of its leaves — no per-object binary walk, no BoW rebuild (the
retrieval signatures are part of the state).

Format history:
  1  round-1/2 layout (no kf_seq / next_seq; pt_first_kf held keyframe
     SLOT indices; may predate pt_obs_kf)
  2  adds kf_seq / next_seq (pt_first_kf holds insertion sequence
     numbers) and the optional float64 `kf_ts64` side array
  3  adds pt_aruco (persistent marker<->point correlation)
  4  adds the persistent loop-edge table loop_i/loop_j/loop_valid
     (KeyFrame::AddLoopEdge parity, reference src/KeyFrame.cc:515-525)
"""

from __future__ import annotations

import numpy as np

from orb_slam2_aruco_tpu.worldmap.state import MapState

import jax.numpy as jnp

_FORMAT_VERSION = 4

# extra (non-MapState) arrays carried in the checkpoint
_EXTRA_KEYS = ("kf_ts64",)


def save_map(path: str, state: MapState, kf_ts64=None) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    if kf_ts64 is not None:
        arrays["kf_ts64"] = np.asarray(kf_ts64, np.float64)
    np.savez_compressed(path, __version__=_FORMAT_VERSION, **arrays)


def load_extras(path: str) -> dict:
    """Non-MapState side arrays stored in the checkpoint (e.g. the float64
    keyframe timestamps)."""
    data = np.load(path)
    return {k: data[k] for k in _EXTRA_KEYS if k in data}


def load_map(path: str) -> MapState:
    data = np.load(path)
    version = int(data["__version__"])
    if version not in (1, 2, 3, 4):
        raise ValueError(f"unsupported map checkpoint version {version}")
    kwargs = {f: jnp.asarray(data[f]) for f in MapState._fields if f in data}
    if "loop_valid" not in kwargs:
        # pre-v4 checkpoints predate the persistent loop-edge table
        from orb_slam2_aruco_tpu.config import MapConfig

        E = MapConfig().max_loop_edges
        kwargs["loop_i"] = jnp.full((E,), -1, jnp.int32)
        kwargs["loop_j"] = jnp.full((E,), -1, jnp.int32)
        kwargs["loop_valid"] = jnp.zeros((E,), bool)
    if "pt_aruco" not in kwargs:
        # pre-v3 checkpoints predate the marker<->point correlation column
        kwargs["pt_aruco"] = jnp.full(
            (kwargs["pt_valid"].shape[0],), -1, jnp.int32
        )
    if "pt_obs_kf" not in kwargs:
        # older checkpoints predate the point<->KF incidence matrix: rebuild
        # it from the observation table (host-side, load is not a hot path)
        obs = np.asarray(kwargs["kf_obs_point"])
        valid = np.asarray(kwargs["kf_kp_valid"])
        L = kwargs["pt_valid"].shape[0]
        inc = np.zeros((L, obs.shape[0]), bool)
        for k in range(obs.shape[0]):
            ids = obs[k][valid[k] & (obs[k] >= 0)]
            inc[ids, k] = True
        kwargs["pt_obs_kf"] = jnp.asarray(inc)
    if "kf_seq" not in kwargs:
        # version-1 migration: derive insertion sequence from frame-id order
        # (v1 maps were written before slot recycling existed, so slot order
        # == insertion order) and remap pt_first_kf from SLOT to sequence
        fid = np.asarray(kwargs["kf_frame_id"])
        kf_valid = np.asarray(kwargs["kf_valid"])
        K = kf_valid.shape[0]
        seq = np.full(K, -1, np.int32)
        order = np.argsort(fid[kf_valid], kind="stable")
        seq[np.flatnonzero(kf_valid)[order]] = np.arange(
            int(kf_valid.sum()), dtype=np.int32
        )
        kwargs["kf_seq"] = jnp.asarray(seq)
        kwargs["next_seq"] = jnp.asarray(int(kf_valid.sum()), jnp.int32)
        first = np.asarray(kwargs["pt_first_kf"])
        remapped = np.where(first >= 0, seq[np.clip(first, 0, K - 1)], -1)
        kwargs["pt_first_kf"] = jnp.asarray(remapped.astype(np.int32))
    return MapState(**kwargs)
