"""Synthetic wireframe VIO sequences with exact ground truth.

The reference validates against a EuRoC rosbag excerpt tracked by git-lfs
(ros_rebvio/test/data/, not shippable here).  This module generates
edge-rich synthetic sequences — a cloud of 3-D line segments rendered with a
pinhole camera along a smooth analytic trajectory — together with exactly
consistent IMU measurements (gyro = body rates, accelerometer = specific
force), so the full VIO stack can be regression-tested end-to-end with a
known trajectory.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from rebvio_tpu.configs import CameraConfig


@dataclasses.dataclass
class Sequence:
    images: np.ndarray      # [N,H,W] float32 raw intensity (0..255)
    ts_us: np.ndarray       # [N] int64 frame timestamps
    imu_ts_us: np.ndarray   # [M] int64
    imu_gyro: np.ndarray    # [M,3] body rates in IMU frame
    imu_acc: np.ndarray     # [M,3] specific force in IMU frame
    gt_pos: np.ndarray      # [N,3] world position of camera
    gt_R_wc: np.ndarray     # [N,3,3] world-from-camera rotation


def make_segments(rng: np.random.RandomState, n: int = 260) -> np.ndarray:
    """Random 3-D line segments in a box in front of the start pose: [n,2,3].

    Mix of axis-aligned 'Manhattan' segments (strong stable edges) and a few
    oblique ones, spread over depth 2..14 m.
    """
    segs = []
    for _ in range(n):
        c = np.array(
            [rng.uniform(-6, 6), rng.uniform(-4, 4), rng.uniform(2.0, 14.0)]
        )
        if rng.rand() < 0.75:
            d = np.zeros(3)
            d[rng.randint(3)] = 1.0
        else:
            d = rng.randn(3)
            d /= np.linalg.norm(d)
        L = rng.uniform(0.8, 4.0)
        segs.append([c - d * L / 2, c + d * L / 2])
    return np.asarray(segs)


def trajectory(t: np.ndarray, speed: float = 0.35, yaw_amp: float = 0.06,
               excitation: float = 1.0):
    """Smooth analytic camera trajectory (world frame, z = optical axis at
    t=0).  Returns (pos[N,3], R_wc[N,3,3], vel[N,3], acc[N,3], omega_body[N,3]).

    ``excitation`` scales the oscillation frequencies so the accelerometer
    sees MAV-flight-like specific forces (the scale filter needs dynamic
    excitation to observe metric scale, like EuRoC's 2-5 m/s^2).
    """
    ax_, ay_ = 0.35, 0.22
    wx_, wy_ = 0.9 * excitation, 0.7 * excitation
    pos = np.stack(
        [
            ax_ * np.sin(wx_ * t),
            ay_ * np.sin(wy_ * t + 0.5),
            speed * t,
        ],
        axis=-1,
    )
    vel = np.stack(
        [
            ax_ * wx_ * np.cos(wx_ * t),
            ay_ * wy_ * np.cos(wy_ * t + 0.5),
            np.full_like(t, speed),
        ],
        axis=-1,
    )
    acc = np.stack(
        [
            -ax_ * wx_ * wx_ * np.sin(wx_ * t),
            -ay_ * wy_ * wy_ * np.sin(wy_ * t + 0.5),
            np.zeros_like(t),
        ],
        axis=-1,
    )
    # orientation: small yaw/pitch oscillation
    yaw = yaw_amp * np.sin(0.8 * t)
    pitch = 0.5 * yaw_amp * np.sin(0.6 * t + 0.3)
    dyaw = yaw_amp * 0.8 * np.cos(0.8 * t)
    dpitch = 0.5 * yaw_amp * 0.6 * np.cos(0.6 * t + 0.3)

    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    N = len(t)
    R_wc = np.zeros((N, 3, 3))
    # R = Ry(yaw) @ Rx(pitch); camera looks along +z
    for i in range(N):
        Ry = np.array([[cy[i], 0, sy[i]], [0, 1, 0], [-sy[i], 0, cy[i]]])
        Rx = np.array([[1, 0, 0], [0, cp[i], -sp[i]], [0, sp[i], cp[i]]])
        R_wc[i] = Ry @ Rx
    # body angular velocity: omega_b = [dpitch (about x), dyaw*cos(pitch)-ish]
    # exact: omega_world = dyaw * ey + Ry @ (dpitch * ex); omega_body = R^T w_w
    omega = np.zeros((N, 3))
    for i in range(N):
        Ry = np.array([[cy[i], 0, sy[i]], [0, 1, 0], [-sy[i], 0, cy[i]]])
        w_w = np.array([0.0, dyaw[i], 0.0]) + Ry @ np.array([dpitch[i], 0.0, 0.0])
        omega[i] = R_wc[i].T @ w_w
    return pos, R_wc, vel, acc, omega


def render_frame(
    segs: np.ndarray, pos: np.ndarray, R_wc: np.ndarray, cam: CameraConfig,
    bg: float = 25.0, fg: float = 235.0, width: float = 1.4,
    distort: bool = False,
) -> np.ndarray:
    """Render line segments with a soft profile into an [H,W] image.

    Points along each visible segment are splatted with a separable soft
    kernel; intensity saturates at ``fg`` where strokes overlap.

    ``distort=True`` renders through the full rad-tan model using the *mean*
    focal length fm for both axes, producing a physically-distorted image
    such that the reference's ``cv::undistort`` with its fm-based camera
    matrix (camera.hpp:39,54-58) — and this repo's equivalent remap
    (camera.py) — recover exactly the ideal fm-pinhole view.  Samples are
    taken along the 3-D segment (straight 3-D lines curve in the distorted
    image).
    """
    H, W = cam.rows, cam.cols
    img = np.full((H, W), bg, np.float32)
    R_cw = R_wc.T
    if distort:
        fx = fy = cam.fm
    else:
        fx, fy = cam.fx, cam.fy
    cx, cy = cam.cx, cam.cy
    acc_img = np.zeros((H, W), np.float32)
    for a, b in segs:
        pa = R_cw @ (a - pos)
        pb = R_cw @ (b - pos)
        # clip to z > 0.3
        if pa[2] < 0.3 and pb[2] < 0.3:
            continue
        if pa[2] < 0.3 or pb[2] < 0.3:
            tcut = (0.3 - pa[2]) / (pb[2] - pa[2])
            if pa[2] < 0.3:
                pa = pa + tcut * (pb - pa)
            else:
                pb = pa + tcut * (pb - pa)
        ua = np.array([fx * pa[0] / pa[2] + cx, fy * pa[1] / pa[2] + cy])
        ub = np.array([fx * pb[0] / pb[2] + cx, fy * pb[1] / pb[2] + cy])
        length = np.linalg.norm(ub - ua)
        if length < 1.0:
            continue
        n_samples = int(min(length * 2.0, 4000))
        ts = np.linspace(0.0, 1.0, n_samples)
        if distort:
            # sample the 3-D segment, project each sample with rad-tan
            from rebvio_tpu.camera import distort_normalized

            p3 = pa[None, :] + ts[:, None] * (pb - pa)[None, :]
            xn = p3[:, 0] / p3[:, 2]
            yn = p3[:, 1] / p3[:, 2]
            xd, yd = distort_normalized(cam, xn, yn)
            pts = np.stack([fx * xd + cx, fy * yd + cy], axis=-1)
        else:
            pts = ua[None, :] + ts[:, None] * (ub - ua)[None, :]
        inb = (
            (pts[:, 0] > -3) & (pts[:, 0] < W + 3) & (pts[:, 1] > -3) & (pts[:, 1] < H + 3)
        )
        pts = pts[inb]
        if len(pts) == 0:
            continue
        x0 = np.floor(pts[:, 0]).astype(np.int64)
        y0 = np.floor(pts[:, 1]).astype(np.int64)
        fxp = pts[:, 0] - x0
        fyp = pts[:, 1] - y0
        for dy in (-1, 0, 1, 2):
            for dx in (-1, 0, 1, 2):
                wgt = np.exp(
                    -(((dx - fxp) ** 2 + (dy - fyp) ** 2)) / (width * width)
                )
                xx = x0 + dx
                yy = y0 + dy
                ok = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
                np.add.at(acc_img, (yy[ok], xx[ok]), wgt[ok])
    stroke = np.clip(acc_img / 1.2, 0.0, 1.0)
    img = bg + (fg - bg) * stroke
    return img.astype(np.float32)


def generate(
    cam: CameraConfig,
    n_frames: int = 60,
    fps: float = 20.0,
    imu_rate: float = 200.0,
    seed: int = 0,
    gravity: Tuple[float, float, float] = (0.0, -9.81, 0.0),
    speed: float = 0.35,
    excitation: float = 2.2,
    distort: bool = False,
    imu_preroll_s: float = 0.0,
    yaw_amp: float = 0.06,
) -> Sequence:
    """Full sequence: images at fps, IMU at imu_rate, exact ground truth.

    Gravity default (0,-9.81,0): world y is 'up' in the camera's initial
    frame (image y points down), matching the y-ish gravity alignment the
    reference's SAB filter expects.

    ``distort=True`` renders physically-distorted frames (see render_frame)
    for pipelines that undistort on input.  ``imu_preroll_s`` emits IMU
    samples starting that long *before* the first frame: the reference's
    IntegratedImu::get divides by n-1 (imu.hpp:81), so the first frame must
    drain either 0 or >=2 samples — a preroll guarantees >=2.
    """
    rng = np.random.RandomState(seed)
    segs = make_segments(rng)
    tf = np.arange(n_frames) / fps
    pos, R_wc, vel, acc, _ = trajectory(tf, speed=speed, yaw_amp=yaw_amp,
                                        excitation=excitation)

    images = np.stack([
        render_frame(segs, pos[i], R_wc[i], cam, distort=distort)
        for i in range(n_frames)
    ])
    ts_us = (tf * 1e6).astype(np.int64) + 1_000_000

    # IMU stream (camera frame == body frame here; the pipeline applies the
    # configured camera->IMU extrinsics, so emit measurements in IMU frame)
    n_imu = int((n_frames / fps + imu_preroll_s) * imu_rate)
    ti = np.arange(n_imu) / imu_rate - imu_preroll_s
    _, R_wc_i, _, acc_i, omega_i = trajectory(ti, speed=speed, yaw_amp=yaw_amp,
                                              excitation=excitation)
    g = np.asarray(gravity)
    R_c2i = cam.R_c2i_np().astype(np.float64)
    gyro = np.zeros((len(ti), 3))
    accm = np.zeros((len(ti), 3))
    for k in range(len(ti)):
        # camera-frame body rate and specific force
        w_cam = omega_i[k]
        f_cam = R_wc_i[k].T @ (acc_i[k] - g)
        # IMU-frame measurement (pipeline rotates back by R_c2i^T)
        gyro[k] = R_c2i @ w_cam
        accm[k] = R_c2i @ f_cam
    imu_ts_us = (ti * 1e6).astype(np.int64) + 1_000_000

    return Sequence(
        images=images,
        ts_us=ts_us,
        imu_ts_us=imu_ts_us,
        imu_gyro=gyro.astype(np.float32),
        imu_acc=accm.astype(np.float32),
        gt_pos=pos.astype(np.float32),
        gt_R_wc=R_wc.astype(np.float32),
    )
