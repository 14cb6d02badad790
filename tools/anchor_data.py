"""Dump a synthetic VIO sequence for the C++ reference anchor driver.

Writes the raw-binary layout consumed by native/reference_anchor/
anchor_driver.cpp plus a ground-truth npz for ATE grading.  Frames are
rendered *with* rad-tan distortion (mean-focal camera matrix) so that the
reference's cv::undistort (camera.hpp:54-58) and this repo's device remap
(rebvio_tpu/camera.py) both recover the same ideal pinhole view — the two
pipelines then consume byte-identical inputs.

Usage: python tools/anchor_data.py [out_dir] [--frames N] [--seed S]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from rebvio_tpu.configs import CameraConfig
from rebvio_tpu.data.synthetic import DEGRADE_PRESETS, generate


def dump(out_dir: str, n_frames: int = 120, seed: int = 0,
         speed: float = 0.35, yaw_amp: float = 0.06,
         degrade: str = "none") -> None:
    cam = CameraConfig()
    seq = generate(
        cam,
        n_frames=n_frames,
        seed=seed,
        distort=True,
        imu_preroll_s=0.1,
        speed=speed,
        yaw_amp=yaw_amp,
        degrade=DEGRADE_PRESETS[degrade],
    )
    os.makedirs(out_dir, exist_ok=True)
    imgs = np.clip(np.round(seq.images), 0, 255).astype(np.uint8)
    N, H, W = imgs.shape
    M = len(seq.imu_ts_us)
    with open(os.path.join(out_dir, "meta.txt"), "w") as f:
        f.write(f"{N} {M} {H} {W}\n")
    imgs.tofile(os.path.join(out_dir, "images.bin"))
    seq.ts_us.astype(np.int64).tofile(os.path.join(out_dir, "image_ts.bin"))
    seq.imu_ts_us.astype(np.int64).tofile(os.path.join(out_dir, "imu_ts.bin"))
    seq.imu_gyro.astype(np.float32).tofile(os.path.join(out_dir, "imu_gyro.bin"))
    seq.imu_acc.astype(np.float32).tofile(os.path.join(out_dir, "imu_acc.bin"))
    np.savez(
        os.path.join(out_dir, "groundtruth.npz"),
        ts_us=seq.ts_us,
        gt_pos=seq.gt_pos,
        gt_R_wc=seq.gt_R_wc,
    )
    print(f"wrote {N} frames ({H}x{W}), {M} imu samples -> {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/anchor_data")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--speed", type=float, default=0.35,
                    help="forward speed [m/s]")
    ap.add_argument("--yaw-amp", type=float, default=0.06,
                    help="yaw oscillation amplitude [rad] (0.06 = the "
                         "original anchor; ~0.5 = rotation-heavy)")
    ap.add_argument("--degrade", default="none", choices=sorted(DEGRADE_PRESETS),
                    help="adversarial imaging preset (synthetic.Degradations)")
    args = ap.parse_args()
    dump(args.out_dir, args.frames, args.seed, args.speed, args.yaw_amp,
         args.degrade)
