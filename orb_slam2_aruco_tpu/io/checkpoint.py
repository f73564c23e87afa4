"""Map checkpoint save/load.

Replaces Map::Save/Load + SystemSetting + InitKeyFrame (reference
src/Map.cc:219-531, src/SystemSetting.cc, src/InitKeyFrame.cc) — and fixes
the reference's gap: markers ARE serialized (the reference loses all
MapArucos on load, KeyFrame.cc:77 / SURVEY.md §3.5).

Because the world map is one pytree of arrays, a checkpoint is a single
npz file of its leaves — no per-object binary walk, no BoW rebuild (the
retrieval signatures are part of the state).
"""

from __future__ import annotations

import numpy as np

from orb_slam2_aruco_tpu.worldmap.state import MapState

import jax.numpy as jnp

_FORMAT_VERSION = 1


def save_map(path: str, state: MapState) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in state._fields}
    np.savez_compressed(path, __version__=_FORMAT_VERSION, **arrays)


def load_map(path: str) -> MapState:
    data = np.load(path)
    version = int(data["__version__"])
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported map checkpoint version {version}")
    kwargs = {f: jnp.asarray(data[f]) for f in MapState._fields if f in data}
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
    return MapState(**kwargs)
