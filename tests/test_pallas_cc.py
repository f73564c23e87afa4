"""Pallas CC kernel (interpret mode on CPU) vs the XLA propagation loop."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.ops.aruco.detector import connected_components
from orb_slam2_aruco_tpu.ops.pallas_cc import cc_propagate_pallas


def _init_labels(binary):
    h, w = binary.shape
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    return jnp.where(binary, flat, h * w)


def test_cc_pallas_matches_xla(rng):
    # marker-like workload: isolated blobs with bounded diameter (a quad
    # border ring + sparse speckle), not percolating noise — the detector
    # only needs convergence for blobs up to the marker screen size
    h = w = 128
    img = rng.random((h, w)) < 0.08
    yy, xx = np.mgrid[0:h, 0:w]
    r = np.sqrt((yy - 64) ** 2 + (xx - 64) ** 2)
    img |= (r > 40) & (r < 48)              # ring: path length ~ pi*44
    img[10:30, 90:118] = True               # solid block
    binary = jnp.asarray(img)
    ref = connected_components(binary, iters=400)   # fully converged
    labels0 = _init_labels(binary)
    out = cc_propagate_pallas(
        labels0, passes=12, k_steps=16, tile=64, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_cc_pallas_blob_separation(rng):
    # two separate blobs keep distinct labels
    img = np.zeros((64, 64), bool)
    img[5:20, 5:20] = True
    img[40:60, 40:60] = True
    binary = jnp.asarray(img)
    out = cc_propagate_pallas(
        _init_labels(binary), passes=6, k_steps=8, tile=32, interpret=True
    )
    o = np.asarray(out)
    l1 = np.unique(o[5:20, 5:20])
    l2 = np.unique(o[40:60, 40:60])
    assert len(l1) == 1 and len(l2) == 1 and l1[0] != l2[0]
