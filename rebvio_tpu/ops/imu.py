"""Inter-frame IMU integration and the acceleration history estimators.

TPU-native rebuild of ``IntegratedImu`` (types/imu.hpp:35-151) and the two
acceleration estimators with function-static histories
(Core::estimateLs4Acceleration, core.cpp:284-332; estimateMeanAcceleration,
core.cpp:334-346).  The incremental add()/get() accumulation becomes one
masked segment reduction over a fixed [S] sample buffer, with the interframe
rotation composed by a lax.scan over SO3 exponentials.

Reference quirks preserved: the first sample of an interval uses a hard-coded
dt of 0.005 s (imu.hpp:58 — the host loader bakes this into dt[0]); the
integration interval uses the integer-division extrapolation
(last-init)/(n-1)*n us (imu.hpp:81 — computed by the host loader into
``dt_interval``).  Quirk deliberately fixed (documented in SURVEY.md sec. 7):
``estimateLs4Acceleration`` uses the V3 history component where the reference
reads the out-of-bounds V[3]; with an all-zero history both agree, so the
reference's golden unit test (test_rebvio.cpp:6-18) still passes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rebvio_tpu import types as T
from rebvio_tpu.geometry import so3


def integrate_imu(
    data: T.ImuFrameData, R_c2i: jnp.ndarray, t_c2i: jnp.ndarray
) -> T.IntegratedImu:
    """Integrate one inter-frame sample buffer (imu.hpp:51-94).

    Gyro/acc are rotated into the camera frame sample-by-sample; the
    interframe rotation is the ordered product of per-sample exponentials
    R = prod_i exp(gyro_c_i * dt_i).
    """
    S = data.gyro.shape[0]
    n = data.n
    valid = jnp.arange(S) < n
    gyro_c = data.gyro @ R_c2i  # == (R_c2i^T @ g_i)^T rows
    acc_c = data.acc @ R_c2i

    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    gyro_mean = jnp.sum(jnp.where(valid[:, None], gyro_c, 0.0), axis=0) / nf
    acc_mean = jnp.sum(jnp.where(valid[:, None], acc_c, 0.0), axis=0) / nf

    # Ordered product of per-sample exponentials via log-depth associative
    # scan (5 levels of batched 3x3 matmuls instead of a 32-step sequential
    # scan); invalid samples contribute identity.
    dRs = so3.exp(gyro_c * data.dt[:, None])  # [S,3,3] batched Rodrigues
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), dRs.shape)
    dRs = jnp.where(valid[:, None, None], dRs, eye)
    prods = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), dRs
    )
    R = prods[-1]

    dt_s = data.dt_interval
    # dgyro = R_c2i^T (gyro_last - gyro_init) / dt_s  (imu.hpp:85), only n>1
    first = data.gyro[0]
    last_idx = jnp.clip(n - 1, 0, S - 1)
    last = data.gyro[last_idx]
    dt_safe = jnp.where(dt_s > 0, dt_s, 1.0)
    dgyro = jnp.where(n > 1, (R_c2i.T @ (last - first)) / dt_safe, jnp.zeros(3, jnp.float32))
    # lever-arm compensation (imu.hpp:88)
    cacc = acc_mean + jnp.cross(dgyro, -(R_c2i.T @ t_c2i))
    # n == 0: identity rotation, zero everything (the reference would return
    # the previous interval's stale values; with a 200 Hz IMU this never
    # happens — we define the clean behavior)
    empty = n == 0
    R = jnp.where(empty, jnp.eye(3, dtype=jnp.float32), R)
    return T.IntegratedImu(
        R=R,
        gyro=jnp.where(empty, 0.0, gyro_mean),
        acc=jnp.where(empty, 0.0, acc_mean),
        dgyro=dgyro,
        cacc=jnp.where(empty, 0.0, cacc),
        dt_s=dt_s,
    )


def estimate_ls4_acceleration(
    vel: jnp.ndarray,
    R: jnp.ndarray,
    dt: jnp.ndarray,
    vel_hist: jnp.ndarray,
    dt_hist: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """5-point least-squares slope of the rotated velocity history
    (core.cpp:284-332).  vel_hist rows = [V, V0, V1, V2, V3].

    Returns (acc, new_vel_hist, new_dt_hist).
    """
    # Rotate the history back through the new inter-frame rotation, then
    # push the new velocity (core.cpp:296-299).
    rot = vel_hist @ R  # rows R^T @ v
    new_hist = jnp.concatenate([vel[None, :], rot[:4]], axis=0)
    new_dt = jnp.concatenate([dt_hist[1:], dt[None]])

    Tt = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(new_dt)])  # [5]
    mt = jnp.sum(Tt[1:]) / 5.0
    den = jnp.sum((Tt - mt) ** 2)
    # weights: V paired with T[4], V0 with T[3], ..., V3 with T[0]
    tw = (Tt[::-1] - mt)  # [5] aligned with rows [V, V0..V3]
    vm = jnp.mean(new_hist, axis=0)  # (V+V0+V1+V2+V3)/5 (V3 fix, see module doc)
    num = jnp.sum((new_hist - vm[None, :]) * tw[:, None], axis=0)
    acc = jnp.where(den > 0, num / den, jnp.zeros(3, jnp.float32))
    return acc, new_hist, new_dt


def estimate_mean_acceleration(
    sacc: jnp.ndarray, R: jnp.ndarray, acc_hist: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """4-frame rotated running mean of the compensated acceleration
    (core.cpp:334-346).  acc_hist rows = [A, A0, A1, A2]."""
    rot = acc_hist @ R  # rows R^T @ a
    new_hist = jnp.concatenate([sacc[None, :], rot[:3]], axis=0)
    acc = 0.25 * jnp.sum(new_hist, axis=0)
    return acc, new_hist


def pack_imu_window(
    gyro: "np.ndarray",
    acc: "np.ndarray",
    ts_us: "np.ndarray",
    sample_max: int,
):
    """Host-side packing of one inter-frame IMU window into ImuFrameData.

    Replicates the reference's timestamp handling: per-sample dt from
    consecutive timestamps with the first sample's dt hard-coded to 0.005 s
    (imu.hpp:54-58), and the interval dt via integer-microsecond
    extrapolation (last-init)/(n-1)*n (imu.hpp:81).
    """
    import numpy as np

    n = len(ts_us)
    g = np.zeros((sample_max, 3), np.float32)
    a = np.zeros((sample_max, 3), np.float32)
    d = np.zeros((sample_max,), np.float32)
    if n > 0:
        n = min(n, sample_max)
        g[:n] = gyro[:n]
        a[:n] = acc[:n]
        d[0] = 0.005
        if n > 1:
            d[1:n] = (ts_us[1:n] - ts_us[: n - 1]).astype(np.float64) / 1e6
            dt_interval_us = int(ts_us[n - 1] - ts_us[0]) // (n - 1) * n
        else:
            dt_interval_us = 0
    else:
        dt_interval_us = 0
    return T.ImuFrameData(
        gyro=jnp.asarray(g),
        acc=jnp.asarray(a),
        dt=jnp.asarray(d),
        n=jnp.asarray(n, jnp.int32),
        dt_interval=jnp.asarray(dt_interval_us / 1e6, jnp.float32),
    )
