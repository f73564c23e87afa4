"""Property tests for SO3/SE3/Sim3 (SURVEY.md §4: round trips, compose)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_aruco_tpu.geometry import lie


def random_rotations(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return lie.quat_to_rot(jnp.asarray(q, dtype=jnp.float32))


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 3)) * 1.5, dtype=jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)


def test_so3_orthonormal(rng):
    w = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
    R = lie.so3_exp(w)
    eye = np.eye(3)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.tile(eye, (32, 1, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_so3_log_small_and_pi(rng):
    # small angle
    w = jnp.asarray(rng.normal(size=(8, 3)) * 1e-6, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(lie.so3_log(lie.so3_exp(w))), np.asarray(w), atol=1e-7)
    # near pi
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * (np.pi - 1e-4), dtype=jnp.float32)
    R = lie.so3_exp(w)
    R2 = lie.so3_exp(lie.so3_log(R))
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-3)


def test_se3_exp_log_roundtrip(rng):
    # compare group elements: for |omega| > pi the log wraps, so xi != xi2
    # while exp(xi2) == exp(xi)
    xi = jnp.asarray(rng.normal(size=(64, 6)), dtype=jnp.float32)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    R2, t2 = lie.se3_exp(xi2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-3)
    # small-rotation subset: xi itself must round-trip
    xi_s = xi * 0.3
    R, t = lie.se3_exp(xi_s)
    np.testing.assert_allclose(
        np.asarray(lie.se3_log(R, t)), np.asarray(xi_s), atol=1e-4
    )


def test_se3_compose_inverse(rng):
    xa = jnp.asarray(rng.normal(size=(16, 6)), dtype=jnp.float32)
    xb = jnp.asarray(rng.normal(size=(16, 6)), dtype=jnp.float32)
    Ra, ta = lie.se3_exp(xa)
    Rb, tb = lie.se3_exp(xb)
    R, t = lie.se3_compose(Ra, ta, Rb, tb)
    x = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    y1 = lie.se3_apply(R, t, x)
    y2 = lie.se3_apply(Ra, ta, lie.se3_apply(Rb, tb, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    Ri, ti = lie.se3_inverse(Ra, ta)
    y3 = lie.se3_apply(Ri, ti, lie.se3_apply(Ra, ta, x))
    np.testing.assert_allclose(np.asarray(y3), np.asarray(x), atol=1e-4)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(64, 7)) * 0.8, dtype=jnp.float32)
    s, R, t = lie.sim3_exp(xi)
    xi2 = lie.sim3_log(s, R, t)
    s2, R2, t2 = lie.sim3_exp(xi2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=2e-3)


def test_sim3_compose_inverse(rng):
    xa = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, dtype=jnp.float32)
    sa, Ra, ta = lie.sim3_exp(xa)
    si, Ri, ti = lie.sim3_inverse(sa, Ra, ta)
    x = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
    y = lie.sim3_apply(si, Ri, ti, lie.sim3_apply(sa, Ra, ta, x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_jit_and_grad():
    xi = jnp.zeros((6,), dtype=jnp.float32)

    def f(xi):
        R, t = lie.se3_exp(xi)
        return jnp.sum(lie.se3_apply(R, t, jnp.ones(3)))

    g = jax.jit(jax.grad(f))(xi)
    assert np.all(np.isfinite(np.asarray(g)))
