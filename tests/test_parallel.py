"""Distributed BA on the virtual 8-device CPU mesh: sharded solve must match
the single-device solve (SURVEY.md §4 'multi-host without a cluster')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_aruco_tpu.optim import ba
from orb_slam2_aruco_tpu.parallel import dist_ba
from tests.test_optim import CAM, _make_ba_problem


def test_distributed_ba_matches_single_device(rng):
    prob, truth = _make_ba_problem(rng, K=4, L=48, M=2)
    single = ba.ba_solve(prob, CAM, iters=8)
    mesh = dist_ba.make_mesh(8)
    multi = dist_ba.distributed_ba_solve(prob, CAM, mesh, iters=8)
    np.testing.assert_allclose(
        np.asarray(multi.Rcw), np.asarray(single.Rcw), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(multi.tcw), np.asarray(single.tcw), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(multi.points), np.asarray(single.points), atol=5e-3
    )
    # and both converge to the ground truth
    np.testing.assert_allclose(
        np.asarray(multi.Rcw), np.asarray(truth["R"]), atol=2e-3
    )


def test_distributed_ba_uneven_edges(rng):
    # edge count not divisible by mesh size -> padding path
    prob, truth = _make_ba_problem(rng, K=3, L=30, M=1)
    assert prob.e_kf.shape[0] % 8 != 0 or prob.m_kf.shape[0] % 8 != 0
    mesh = dist_ba.make_mesh(8)
    multi = dist_ba.distributed_ba_solve(prob, CAM, mesh, iters=8)
    np.testing.assert_allclose(
        np.asarray(multi.Rcw), np.asarray(truth["R"]), atol=2e-3
    )
