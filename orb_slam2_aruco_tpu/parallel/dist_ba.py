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


def partition_edges_by_point(prob: ba.BAProblem, n_shards: int):
    """Permute + pad the POINT-edge lists so that (a) every point's edges
    land on ONE shard and (b) shard loads are balanced (greedy
    longest-processing-time assignment of per-point edge groups).

    This is the landmark-decomposition layout: landmark marginalization is
    embarrassingly parallel given replicated camera states, so owning a
    point's whole edge group makes the CG's landmark-sized intermediate
    shard-local — each CG step then needs only one camera-sized collective
    (ba.ba_solve edges_by_point). Masked/padding edges fill the per-shard
    remainder. Returns (permuted problem, scatter [E2] int32 mapping each
    permuted edge to its ORIGINAL index, -1 for padding)."""
    e_pt = np.asarray(prob.e_pt)
    e_mask = np.asarray(prob.e_mask)
    E = e_pt.shape[0]
    valid = e_mask > 0
    vidx = np.flatnonzero(valid)
    midx = np.flatnonzero(~valid)
    order = vidx[np.argsort(e_pt[vidx], kind="stable")]
    pts, starts, counts = np.unique(
        e_pt[order], return_index=True, return_counts=True
    )
    # LPT: biggest groups first onto the lightest shard
    shard_of = np.zeros(len(pts), np.int32)
    load = np.zeros(n_shards, np.int64)
    for g in np.argsort(-counts, kind="stable"):
        s = int(np.argmin(load))
        shard_of[g] = s
        load[s] += counts[g]
    # spread masked edges to even the loads before computing the cap
    spare = np.zeros(n_shards, np.int64)
    for i in range(len(midx)):
        s = int(np.argmin(load + spare))
        spare[s] += 1
    cap = int(np.max(load + spare)) if E else 0
    scatter = np.full(n_shards * cap, -1, np.int64)
    fill = np.zeros(n_shards, np.int64)
    for g in np.argsort(-counts, kind="stable"):
        s = shard_of[g]
        n = counts[g]
        o = s * cap + fill[s]
        scatter[o:o + n] = order[starts[g]:starts[g] + n]
        fill[s] += n
    mi = 0
    for s in range(n_shards):
        take = min(len(midx) - mi, cap - int(fill[s]))
        if take > 0:
            o = s * cap + int(fill[s])
            scatter[o:o + take] = midx[mi:mi + take]
            mi += take
            fill[s] += take

    def permute1(x):
        xn = np.asarray(x)
        out = np.zeros((len(scatter),) + xn.shape[1:], xn.dtype)
        ok = scatter >= 0
        out[ok] = xn[scatter[ok]]
        return jnp.asarray(out)

    new_mask = np.zeros(len(scatter), np.float32)
    ok = scatter >= 0
    new_mask[ok] = np.asarray(prob.e_mask)[scatter[ok]]
    prob2 = prob._replace(
        e_kf=permute1(prob.e_kf), e_pt=permute1(prob.e_pt),
        e_uv=permute1(prob.e_uv), e_info=permute1(prob.e_info),
        e_mask=jnp.asarray(new_mask),
    )
    return prob2, scatter


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
    """Run ba_solve with observations sharded over the mesh axis.

    Point edges are PARTITIONED BY LANDMARK (partition_edges_by_point) so
    each CG step's cross-shard traffic is one fused camera-sized psum; the
    returned edge_chi2 is scattered back to the caller's original edge
    order."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    E_orig = int(prob.e_kf.shape[0])
    prob, scatter = partition_edges_by_point(prob, n)
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
            psum_axis=axis, edges_by_point=True,
        )

    f = jax.shard_map(step, mesh=mesh, in_specs=(in_specs,),
                      out_specs=out_specs, check_vma=False)
    out = jax.jit(f)(prob)
    # un-permute the per-edge chi2 back to the caller's edge order
    chi = np.zeros(E_orig, np.float32)
    chi_perm = np.asarray(out.edge_chi2)[: len(scatter)]
    ok = scatter >= 0
    chi[scatter[ok]] = chi_perm[ok]
    return out._replace(edge_chi2=jnp.asarray(chi))
