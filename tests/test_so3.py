import numpy as np
import jax.numpy as jnp

from rebvio_tpu.geometry import so3


def test_exp_log_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(50):
        d = rng.randn(3)
        d /= np.linalg.norm(d)
        w = (d * rng.uniform(1e-6, 3.0)).astype(np.float32)  # |w| < pi
        R = so3.exp(jnp.asarray(w))
        R_np = np.asarray(R)
        assert np.allclose(R_np @ R_np.T, np.eye(3), atol=1e-5)
        assert np.isclose(np.linalg.det(R_np), 1.0, atol=1e-5)
        w2 = np.asarray(so3.log(R))
        assert np.allclose(w2, w, atol=1e-4), (w, w2)


def test_exp_small_angle():
    w = jnp.asarray([1e-9, -1e-9, 1e-9], jnp.float32)
    R = np.asarray(so3.exp(w))
    assert np.allclose(R, np.eye(3), atol=1e-7)


def test_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = (axis * (np.pi - 1e-4)).astype(np.float32)
    R = so3.exp(jnp.asarray(w))
    w2 = np.asarray(so3.log(R))
    assert np.allclose(w2, w, atol=1e-2)


def test_rotation_between():
    rng = np.random.RandomState(1)
    for _ in range(30):
        a = rng.randn(3).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        R = np.asarray(so3.rotation_between(jnp.asarray(a), jnp.asarray(b)))
        an = a / np.linalg.norm(a)
        bn = b / np.linalg.norm(b)
        assert np.allclose(R @ an, bn, atol=1e-5)


def test_rotation_between_antipodal():
    a = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    b = jnp.asarray([-1.0, 1e-8, 0.0], jnp.float32)
    R = np.asarray(so3.rotation_between(a, b))
    assert np.allclose(R @ np.array([1.0, 0, 0]), np.array([-1.0, 0, 0]), atol=1e-4)
