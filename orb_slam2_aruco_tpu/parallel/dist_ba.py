"""Distributed bundle adjustment over a device mesh.

The reference has no distributed computing (SURVEY.md §2.3); its 'backend' is
4 threads + ~20 mutexes. The TPU-native scaling story (BASELINE.json
north star): shard the BA **edge lists** (observations) across a mesh axis —
keyframe-block partitioning — replicate the small state (poses, landmarks,
markers), and reduce the per-shard normal-equation contributions with `psum`
over ICI. Every device then solves the same reduced camera system and applies
identical updates, so states stay replicated with zero extra traffic.

This is the SPMD analogue of the reference's GBA thread: the Schur landmark
reduction is embarrassingly parallel over observations; only the [6K+6M]^2
dense system assembly needs the collective.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam2_aruco_tpu.geometry.camera import Camera
from orb_slam2_aruco_tpu.optim import ba


def make_mesh(n_devices: Optional[int] = None, axis: str = "kf") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_edges_to(prob: ba.BAProblem, multiple: int) -> ba.BAProblem:
    """Pad the edge lists so their length divides the mesh size (padded edges
    are masked out)."""

    def pad1(x, n_to):
        pad = n_to - x.shape[0]
        if pad == 0:
            return x
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

    E = prob.e_kf.shape[0]
    F = prob.m_kf.shape[0]
    E2 = -(-E // multiple) * multiple
    F2 = -(-F // multiple) * multiple
    return prob._replace(
        e_kf=pad1(prob.e_kf, E2), e_pt=pad1(prob.e_pt, E2),
        e_uv=pad1(prob.e_uv, E2), e_info=pad1(prob.e_info, E2),
        e_mask=pad1(prob.e_mask, E2),
        m_kf=pad1(prob.m_kf, F2), m_marker=pad1(prob.m_marker, F2),
        m_corner=pad1(prob.m_corner, F2), m_uv=pad1(prob.m_uv, F2),
        m_info=pad1(prob.m_info, F2), m_mask=pad1(prob.m_mask, F2),
    )


def distributed_ba_solve(
    prob: ba.BAProblem,
    cam: Camera,
    mesh: Mesh,
    iters: int = 10,
    huber_delta: float = 2.4477,
    lam0: float = 1e-4,
) -> ba.BAResult:
    """Run ba_solve with observations sharded over the mesh axis."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    prob = pad_edges_to(prob, n)
    shard = P(axis)
    repl = P()
    in_specs = ba.BAProblem(
        Rcw=repl, tcw=repl, points=repl, Rwm=repl, twm=repl, marker_side=repl,
        e_kf=shard, e_pt=shard, e_uv=shard, e_info=shard, e_mask=shard,
        m_kf=shard, m_marker=shard, m_corner=shard, m_uv=shard, m_info=shard,
        m_mask=shard,
        cam_free=repl, pt_free=repl, marker_free=repl,
    )
    out_specs = ba.BAResult(
        Rcw=repl, tcw=repl, points=repl, Rwm=repl, twm=repl, chi2=repl,
        edge_chi2=shard, medge_chi2=shard,
    )

    def step(p):
        return ba.ba_solve(
            p, cam, iters=iters, huber_delta=huber_delta, lam0=lam0,
            psum_axis=axis,
        )

    f = jax.shard_map(step, mesh=mesh, in_specs=(in_specs,),
                      out_specs=out_specs, check_vma=False)
    return jax.jit(f)(prob)
