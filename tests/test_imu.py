import numpy as np
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.ops import imu as imu_ops
from rebvio_tpu.geometry import so3


def test_ls4_acceleration_reference_golden():
    """Reproduces the reference's only unit test (test_rebvio.cpp:6-18):
    first call with zero history must return the golden values."""
    Vgv = np.array([-4.06833e-05, 9.40667e-05, 5.70767e-05], np.float32)
    dt = 0.05
    R = np.array(
        [
            [1, 8.83134e-05, -7.48149e-05],
            [-8.831e-05, 1, 4.57494e-05],
            [7.4819e-05, -4.57428e-05, 1],
        ],
        np.float32,
    )
    vel_hist = jnp.zeros((5, 3), jnp.float32)
    dt_hist = jnp.zeros((4,), jnp.float32)
    acc, vh, dh = imu_ops.estimate_ls4_acceleration(
        jnp.asarray(-Vgv / dt), jnp.asarray(R), jnp.float32(dt), vel_hist, dt_hist
    )
    acc = np.asarray(acc)
    assert np.isclose(acc[0], 0.0162734, atol=1e-5)
    assert np.isclose(acc[1], -0.0376267, atol=1e-5)
    assert np.isclose(acc[2], -0.0228307, atol=1e-5)


def test_mean_acceleration_history():
    R = jnp.eye(3, dtype=jnp.float32)
    hist = jnp.zeros((4, 3), jnp.float32)
    a1 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    acc, hist = imu_ops.estimate_mean_acceleration(a1, R, hist)
    assert np.isclose(float(acc[0]), 0.25)
    acc, hist = imu_ops.estimate_mean_acceleration(a1, R, hist)
    assert np.isclose(float(acc[0]), 0.5)


def test_integrate_constant_rotation():
    """Constant gyro about z: integrated rotation = exp(w * total_dt)."""
    R_c2i = np.eye(3, dtype=np.float32)
    t_c2i = np.zeros(3, np.float32)
    w = np.array([0.0, 0.0, 0.5], np.float32)
    n = 10
    ts = (np.arange(n) * 5000 + 10000).astype(np.int64)  # 5 ms spacing
    data = imu_ops.pack_imu_window(
        np.tile(w, (n, 1)), np.tile([0, 0, 9.81], (n, 1)), ts, 16
    )
    out = imu_ops.integrate_imu(data, jnp.asarray(R_c2i), jnp.asarray(t_c2i))
    # total integrated time = first sample 0.005 + 9 * 0.005 = 0.05
    R_want = np.asarray(so3.exp(jnp.asarray(w * 0.05)))
    assert np.allclose(np.asarray(out.R), R_want, atol=1e-5)
    assert np.allclose(np.asarray(out.gyro), w, atol=1e-6)
    assert np.allclose(np.asarray(out.acc), [0, 0, 9.81], atol=1e-5)
    # dt quirk: (last-init)/(n-1)*n us = 45000/9*10 = 50000 us
    assert np.isclose(float(out.dt_s), 0.05)


def test_integrate_camera_frame_rotation():
    """Gyro measured in IMU frame is rotated into the camera frame."""
    th = 0.3
    R_c2i = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
        np.float32,
    )
    t_c2i = np.zeros(3, np.float32)
    w_imu = np.array([0.2, 0.0, 0.0], np.float32)
    n = 5
    ts = (np.arange(n) * 5000 + 1000).astype(np.int64)
    data = imu_ops.pack_imu_window(
        np.tile(w_imu, (n, 1)), np.zeros((n, 3)), ts, 8
    )
    out = imu_ops.integrate_imu(data, jnp.asarray(R_c2i), jnp.asarray(t_c2i))
    w_cam = R_c2i.T @ w_imu
    assert np.allclose(np.asarray(out.gyro), w_cam, atol=1e-6)


def test_lever_arm_compensation():
    """Nonzero dgyro x lever arm contributes to cacc (imu.hpp:88)."""
    R_c2i = np.eye(3, dtype=np.float32)
    t_c2i = np.array([0.1, 0.0, 0.0], np.float32)
    n = 4
    ts = (np.arange(n) * 5000 + 1000).astype(np.int64)
    gyro = np.zeros((n, 3), np.float32)
    gyro[:, 2] = np.linspace(0.0, 0.3, n)  # angular acceleration about z
    data = imu_ops.pack_imu_window(gyro, np.zeros((n, 3)), ts, 8)
    out = imu_ops.integrate_imu(data, jnp.asarray(R_c2i), jnp.asarray(t_c2i))
    dt_s = float(out.dt_s)
    dgyro = (gyro[-1] - gyro[0]) / dt_s
    cacc_want = np.cross(dgyro, -t_c2i)
    assert np.allclose(np.asarray(out.cacc), cacc_want, atol=1e-5)
